package graft.app

import java.nio.file.{Files, Paths}

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
  * Usage: IndexJob <sourceParquetOrTable> <outDir> [buckets] [--code-aware] [--add] [--codec=varint|pfor]
  *
  * `--codec=pfor` writes PFOR-coded posting blocks (patched
  * frame-of-reference — the north_rule's "varint/PForDelta" alternative;
  * denser bytes, identical answers). `--add` always inherits the existing
  * index's codec from its meta, so the flag applies to fresh builds only.
  *
  * CLI discipline mirrors the reference's ordered validation matrix
  * (/root/reference/tests/test_cli_exit_codes.cpp:133-327): argument errors
  * (unknown flag, arity, bad value) exit 2 with a usage line on stderr BEFORE
  * any work; runtime preconditions (missing source path, --add on a
  * non-index) exit 3 — and are checked BEFORE Spark starts, so failures are
  * immediate. stdout carries only the success summary.
  */
object IndexJob {
  private val KnownFlags = Set("--code-aware", "--add")
  private val Usage = "usage: IndexJob <source> <outDir> [buckets] [--code-aware] [--add] [--codec=varint|pfor]"

  private def usageErr(msg: String): Int = {
    System.err.println(s"IndexJob: $msg")
    System.err.println(Usage)
    2
  }
  private def runtimeErr(msg: String): Int = { System.err.println(s"IndexJob: $msg"); 3 }

  /** Validation + work; returns the process exit code (testable without
    * forking — CliSpec asserts the full matrix in-process).
    */
  def run(args: Array[String]): Int = {
    // reference contract: --help prints usage on STDOUT and exits 0, and
    // wins over any other argument (tests/test_cli_lifecycle.cpp)
    if (args.contains("--help")) { println(Usage); return 0 }
    val flags = args.filter(_.startsWith("--")).toIndexedSeq
    val pos = args.filterNot(_.startsWith("--")).toIndexedSeq

    // --- exit-2 layer (argument matrix, ordered: flags -> arity -> values)
    val unknown = flags.filterNot(f => KnownFlags(f) || f.startsWith("--codec="))
    if (unknown.nonEmpty) return usageErr(s"unknown flag: ${unknown.head}")
    val codec = flags.collectFirst { case f if f.startsWith("--codec=") => f.stripPrefix("--codec=") } match {
      case None | Some("varint") => graft.index.BlockCodec.CodecVarint
      case Some("pfor") => graft.index.BlockCodec.CodecPfor
      case Some(other) => return usageErr(s"unknown codec '$other' (varint|pfor)")
    }
    if (pos.length < 2) return usageErr("missing required <source> <outDir>")
    if (pos.length > 3) return usageErr(s"unexpected argument: ${pos(3)}")
    val buckets = pos.lift(2) match {
      case None => 32
      case Some(b) => b.toIntOption.filter(_ > 0) match {
        case Some(v) => v
        case None => return usageErr(s"buckets must be a positive integer, got '$b'")
      }
    }
    val source = pos(0)
    val outDir = pos(1)
    val codeAware = flags.contains("--code-aware")
    val addMode = flags.contains("--add")
    // --add inherits the existing index's codec from its meta (and the
    // bootstrap of a missing index is an operational surprise to codec-pin);
    // accepting-and-ignoring the flag would be worse than refusing
    if (addMode && flags.exists(_.startsWith("--codec=")))
      return usageErr("--codec applies to fresh builds; --add inherits the index codec")

    // --- exit-3 layer (runtime preconditions, before Spark starts)
    if (source.contains("/") && !Files.exists(Paths.get(source)))
      return runtimeErr(s"source path does not exist: $source")
    if (addMode && !Files.exists(Paths.get(outDir, "index_meta.json")))
      return runtimeErr(s"--add requires an existing index at $outDir (no index_meta.json)")

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
          SegmentIndex.build(docs.select("doc_id", "text", "source", "lang"), outDir, buckets, codeAware,
            codec = codec)

      // invariant: the docstore materialization must re-hash to the source
      val store = spark.read.parquet(s"$outDir/docstore")
      val bad = store
        .join(docs, Seq("doc_id"))
        .filter(col("sha") =!= col("content_sha"))
        .count()
      if (bad != 0) return runtimeErr(s"sha256 invariant VIOLATED on $bad rows")

      val docsN = manifests.map(_.nDocs).sum
      val bytes = manifests.map(_.bytes).sum
      println(s"Indexing completed: docs=$docsN buckets=${manifests.size} segmentBytes=$bytes out=$outDir")
      0
    } catch {
      case e: Throwable => runtimeErr(s"index job failed: ${e.getMessage}")
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
