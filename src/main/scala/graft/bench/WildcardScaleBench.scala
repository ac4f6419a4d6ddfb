package graft.bench

import graft.index.SegmentIndex
import graft.search.SegmentSearch

/** Measures what the reversed-term dictionary buys (r6): per-request cost
  * of a leading-wildcard serving query (`*bar` shape) at two vocabulary
  * sizes, vs the unanchored pattern (`*a*` shape) that still walks the
  * vocabulary. The walk grows ~linearly with vocabulary; the reversed
  * range scan should stay ~flat.
  *
  *   runMain graft.bench.WildcardScaleBench [vocabSmall] [factor]
  */
object WildcardScaleBench {
  def main(args: Array[String]): Unit = {
    val vSmall = args.headOption.flatMap(_.toIntOption).getOrElse(20000)
    val factor = args.lift(1).flatMap(_.toIntOption).getOrElse(8)
    val spark = graft.spark.Sessions.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      shufflePartitions = 16, appName = "graft-wildcard-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def engineFor(vocab: Int): SegmentSearch.ServingEngine = {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-wild").toString
      val docs = spark.range(1, vocab + 1)
        .select($"id".as("doc_id"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("w"),
            $"id".cast("string")).as("text"))
      SegmentIndex.build(docs, dir, buckets = 8)
      val meta = SegmentIndex.readMeta(dir)
      val segs = SegmentIndex.liveSegmentFiles(dir, meta).map(SegmentIndex.loadSegment(_)).toIndexedSeq
      scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf", dir)).!)
      new SegmentSearch.ServingEngine(segs, meta)
    }

    // `*31415` matches exactly w31415 and any wNN31415 — a handful of terms
    // regardless of vocab; `*1*` matches ~half the vocab (walk-shaped)
    def perReq(e: SegmentSearch.ServingEngine, pat: String, reps: Int): Double = {
      var i = 0
      while (i < reps) { e.searchWildcard(pat, 10); i += 1 } // warm + lazy dict build
      val t0 = System.nanoTime()
      i = 0
      while (i < reps) { e.searchWildcard(pat, 10); i += 1 }
      (System.nanoTime() - t0) / 1e3 / reps // micros per request
    }

    val eSmall = engineFor(vSmall)
    val eBig = engineFor(vSmall * factor)
    Workload.awaitQuietHost("wildcard bench", capMs = 120000)
    val revSmall = perReq(eSmall, "*3141", reps = 2000)
    val revBig = perReq(eBig, "*3141", reps = 2000)
    val walkSmall = perReq(eSmall, "*3*1*", reps = 200)
    val walkBig = perReq(eBig, "*3*1*", reps = 200)
    println(f"""{"vocab_small":$vSmall,"vocab_big":${vSmall * factor},""" +
      f""""reversed_us_small":$revSmall%.1f,"reversed_us_big":$revBig%.1f,""" +
      f""""walk_us_small":$walkSmall%.1f,"walk_us_big":$walkBig%.1f,""" +
      f""""reversed_growth":${revBig / revSmall}%.2f,"walk_growth":${walkBig / walkSmall}%.2f}""")
    spark.stop()
  }
}
