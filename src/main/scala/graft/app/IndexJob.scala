package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{DocIdAssigner, SegmentIndex}
import graft.sources.SourceTable

/** EP1 — the spark-submit index-build job (reference: `searchd --index`,
  * SURVEY §3.1), over the input_hint source table:
  *
  *   source(repo, path, commit, lang, content)
  *     -> sha256 invariant attached
  *     -> deterministic dense docIds in (repo, path) order (P2)
  *     -> resumable segment build (postings blocks + manifests + docstore)
  *     -> invariant re-verified against the docstore materialization
  *
  * `--add` appends the source as NEW segments to an existing IndexJob-built
  * index (the reference's add_document flow): delta docIds continue the
  * dense 1..N sequence from the existing meta, so they never collide.
  *
  * Usage: IndexJob <sourceParquetOrTable> <outDir> [buckets] [--code-aware] [--add]
  * Exit codes mirror the reference: 0 ok, 2 usage, 3 build/verify failure.
  */
object IndexJob {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: IndexJob <source> <outDir> [buckets] [--code-aware] [--add]")
      sys.exit(2)
    }
    val source = args(0)
    val outDir = args(1)
    val buckets = args.drop(2).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(32)
    val codeAware = args.contains("--code-aware")
    val addMode = args.contains("--add")

    // under spark-submit the master comes from the launcher; when driven
    // directly (sbt runMain / tests) fall back to local[*]
    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
      else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-job")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val src = SourceTable.withSha(SourceTable.load(spark, source))
      // --add: continue the dense docId sequence past the existing corpus
      val idOffset =
        if (addMode) SegmentIndex.readMeta(outDir).n
        else 0L
      val withIds = DocIdAssigner.assign(src, Seq("repo", "path"), "doc_id")
        .withColumn("doc_id", col("doc_id") + lit(idOffset))
      val docs = withIds.select(
        col("doc_id"), col("content").as("text"), col("content_sha"),
        col("repo").as("source"), col("lang"))

      val manifests =
        if (addMode)
          SegmentIndex.addDocuments(
            docs.select("doc_id", "text", "source", "lang"), outDir, buckets, codeAware)
        else
          SegmentIndex.build(docs.select("doc_id", "text", "source", "lang"), outDir, buckets, codeAware)

      // invariant: the docstore materialization must re-hash to the source
      val store = spark.read.parquet(s"$outDir/docstore")
      val bad = store
        .join(docs, Seq("doc_id"))
        .filter(col("sha") =!= col("content_sha"))
        .count()
      if (bad != 0) { System.err.println(s"sha256 invariant VIOLATED on $bad rows"); sys.exit(3) }

      val docsN = manifests.map(_.nDocs).sum
      val bytes = manifests.map(_.bytes).sum
      println(s"Indexing completed: docs=$docsN buckets=${manifests.size} segmentBytes=$bytes out=$outDir")
    } catch {
      case e: Throwable => System.err.println(s"index job failed: ${e.getMessage}"); sys.exit(3)
    }
  }
}
