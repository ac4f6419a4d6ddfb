package graft.bench

import graft.index.SegmentIndex
import graft.search.SegmentSearch

/** Measures what the SymSpell deletion neighborhood buys: per-request cost
  * of the fuzzy family at two vocabulary sizes, SymSpell path (maxDist=1)
  * vs the fallback dictionary scan (maxDist=2 — the path every request took
  * before round 5). The scan should grow ~linearly with vocabulary; the
  * neighborhood should stay ~flat.
  *
  *   runMain graft.bench.FuzzyScaleBench [vocabSmall] [factor]
  */
object FuzzyScaleBench {
  def main(args: Array[String]): Unit = {
    val vSmall = args.headOption.flatMap(_.toIntOption).getOrElse(20000)
    val factor = args.lift(1).flatMap(_.toIntOption).getOrElse(8)
    val spark = graft.spark.Sessions.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      shufflePartitions = 16, appName = "graft-fuzzy-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def engineFor(vocab: Int, depth: Int = 1): SegmentSearch.ServingEngine = {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-fuzzy").toString
      val docs = spark.range(1, vocab + 1)
        .select($"id".as("doc_id"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("w"),
            $"id".cast("string")).as("text"))
      SegmentIndex.build(docs, dir, buckets = 8)
      val meta = SegmentIndex.readMeta(dir)
      val segs = SegmentIndex.liveSegmentFiles(dir, meta).map(SegmentIndex.loadSegment(_)).toIndexedSeq
      scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf", dir)).!)
      new SegmentSearch.ServingEngine(segs, meta, symspellDepth = depth)
    }

    def perReq(e: SegmentSearch.ServingEngine, dist: Int, reps: Int): Double = {
      val probes = Array("w1234", "w999999x", "w42", "w31415z")
      var i = 0
      while (i < reps / 4) { probes.foreach(e.didYouMean(_, maxDist = dist)); i += 1 } // warm + build index
      val t0 = System.nanoTime()
      i = 0
      while (i < reps / 4) { probes.foreach(e.didYouMean(_, maxDist = dist)); i += 1 }
      (System.nanoTime() - t0) / 1e3 / reps // micros per request
    }

    val eSmall = engineFor(vSmall)
    val eBig = engineFor(vSmall * factor)
    // r6: depth-2 engines — maxDist=2 through the deletion neighborhood
    val e2Small = engineFor(vSmall, depth = 2)
    val e2Big = engineFor(vSmall * factor, depth = 2)
    Workload.awaitQuietHost("fuzzy bench", capMs = 120000)
    val symSmall = perReq(eSmall, dist = 1, reps = 4000)
    val symBig = perReq(eBig, dist = 1, reps = 4000)
    val scanSmall = perReq(eSmall, dist = 2, reps = 200)
    val scanBig = perReq(eBig, dist = 2, reps = 200)
    val sym2Small = perReq(e2Small, dist = 2, reps = 2000)
    val sym2Big = perReq(e2Big, dist = 2, reps = 2000)
    println(f"""{"vocab_small":$vSmall,"vocab_big":${vSmall * factor},""" +
      f""""symspell_us_small":$symSmall%.1f,"symspell_us_big":$symBig%.1f,""" +
      f""""scan_us_small":$scanSmall%.1f,"scan_us_big":$scanBig%.1f,""" +
      f""""symspell2_us_small":$sym2Small%.1f,"symspell2_us_big":$sym2Big%.1f,""" +
      f""""symspell_growth":${symBig / symSmall}%.2f,"scan_growth":${scanBig / scanSmall}%.2f,""" +
      f""""symspell2_growth":${sym2Big / sym2Small}%.2f}""")
    spark.stop()
  }
}
