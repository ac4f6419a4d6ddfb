package graft.bench

import java.nio.file.{Files, Paths}

import graft.index.{HaystackExport, HaystackImport, SegmentIndex}
import graft.search.SegmentSearch

/** VERDICT r5 #9: soak the reference-format import/export loop at bench
  * scale (sf0.1 x replicas, the 160k-doc corpus the graded bench builds) —
  * the demo-size byte-identity specs prove the format; this proves the loop
  * holds at the size the engine is actually benched at, and (r6) exercises
  * the packed-tfbin docstore seam on both directions:
  *
  *   native build -> export A -> import -> search parity (200-query bench
  *   set, every rank/docId identical, scores within 1e-9) -> export B ->
  *   A == B byte-identically (all three files).
  *
  * Prints one JSON verdict line.
  */
object RoundTripSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = args.headOption.flatMap(_.toIntOption).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.spark.Sessions
      .configure(org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.local.dir", "/dev/shm/graft-spark-local"), cpus, "graft-roundtrip-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory(Paths.get("/dev/shm"), "graft-rt").toString
    val nativeIdx = s"$base/native"
    val exportA = s"$base/exportA"
    val imported = s"$base/imported"
    val exportB = s"$base/exportB"
    try {
      val docs = Workload.replicatedDocs(spark, sfDir, replicas)
      val manifests = SegmentIndex.build(docs, nativeIdx, buckets = cpus)
      val nDocs = manifests.map(_.nDocs).sum

      val (nExpDocs, nTerms) = HaystackExport.exportIndex(spark, nativeIdx, exportA)
      require(nExpDocs == nDocs, s"export A docs $nExpDocs != built $nDocs")

      HaystackImport.importIndex(spark, exportA, imported, buckets = cpus)

      val qs = Workload.queries(spark, sfDir, 200)
      val a = SegmentSearch.searchBatch(spark, nativeIdx, qs, k = 10)
      val b = SegmentSearch.searchBatch(spark, imported, qs, k = 10)
      var rankMismatch = 0
      var scoreDrift = 0
      qs.indices.foreach { qid =>
        val (ra, rb) = (a(qid), b(qid))
        if (ra.map(_._1) != rb.map(_._1)) rankMismatch += 1
        else if (ra.zip(rb).exists { case ((_, sa), (_, sb)) => math.abs(sa - sb) > 1e-9 })
          scoreDrift += 1
      }

      val (nExpDocs2, nTerms2) = HaystackExport.exportIndex(spark, imported, exportB)
      def shaOf(dir: String, f: String): String =
        SegmentIndex.sha256Hex(Files.readAllBytes(Paths.get(dir, f)))
      val files = Seq("index_meta.json", "docs.jsonl", "postings.bin")
      val byteMismatch = files.filterNot(f => shaOf(exportA, f) == shaOf(exportB, f))

      val ok = rankMismatch == 0 && scoreDrift == 0 && byteMismatch.isEmpty &&
        nExpDocs2 == nDocs && nTerms2 == nTerms
      println(s"""{"soak":"import_export_roundtrip","docs":$nDocs,"terms":$nTerms,""" +
        s""""queries":${qs.size},"rank_mismatch":$rankMismatch,"score_drift":$scoreDrift,""" +
        s""""byte_mismatch":${byteMismatch.map(f => s""""$f"""").mkString("[", ",", "]")},""" +
        s""""ok":$ok}""")
      if (!ok) sys.exit(1)
    } finally {
      spark.stop()
      scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf", base)).!)
    }
  }
}
