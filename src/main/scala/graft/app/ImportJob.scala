package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.index.{BlockCodec, HaystackImport}

/** Migration job: import a reference-format (Haystack) index directory —
  * index_meta.json / docs.jsonl / postings.bin, see
  * /root/reference/specs/phase2_persistence.md — into a graft segment index
  * that every tier (dataflow, distributed segments, serving) can use.
  *
  *   ImportJob <haystackIndexDir> <outIndexDir> [buckets] [--codec=pfor]
  *
  * CLI discipline mirrors the reference's ordered validation
  * (tests/test_cli_exit_codes.cpp): argument errors exit 2 with usage on
  * stderr; runtime preconditions (not a haystack index, unsupported
  * schema_version) exit 3.
  */
object ImportJob {
  private val Usage = "usage: ImportJob <haystackIndexDir> <outIndexDir> [buckets] [--codec=pfor]"

  private def usageErr(msg: String): Int = {
    System.err.println(s"ImportJob: $msg")
    System.err.println(Usage)
    2
  }
  private def runtimeErr(msg: String): Int = { System.err.println(s"ImportJob: $msg"); 3 }

  /** Validation + work; returns the process exit code (spec-testable). */
  def run(args: Array[String]): Int = {
    if (args.contains("--help")) { println(Usage); return 0 }
    val flags = args.filter(_.startsWith("--")).toIndexedSeq
    val pos = args.filterNot(_.startsWith("--")).toIndexedSeq

    // --- exit-2 layer (flags -> arity -> values)
    val unknown = flags.filterNot(_.startsWith("--codec="))
    if (unknown.nonEmpty) return usageErr(s"unknown flag: ${unknown.head}")
    val codec = flags.collectFirst { case f if f.startsWith("--codec=") => f.stripPrefix("--codec=") }
      .getOrElse(BlockCodec.CodecVarint)
    if (codec != BlockCodec.CodecVarint && codec != BlockCodec.CodecPfor)
      return usageErr(s"unknown codec: $codec")
    if (pos.length < 2) return usageErr("missing required <haystackIndexDir> <outIndexDir>")
    if (pos.length > 3) return usageErr(s"unexpected argument: ${pos(3)}")
    val buckets = pos.lift(2).map(_.toIntOption) match {
      case None => Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
      case Some(Some(b)) if b >= 1 => Some(b)
      case Some(_) => None
    }
    if (buckets.isEmpty) return usageErr(s"invalid buckets: ${pos(2)}")

    // --- exit-3 layer: runtime preconditions before Spark starts
    val hsDir = pos(0)
    if (!Files.exists(Paths.get(hsDir, "index_meta.json")))
      return runtimeErr(s"not a haystack index (no index_meta.json): $hsDir")
    try HaystackImport.readHsMeta(hsDir)
    catch { case e: IllegalArgumentException => return runtimeErr(e.getMessage) }

    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
      else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-import")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ms = HaystackImport.importIndex(spark, hsDir, pos(1), buckets.get, codec)
      println(s"Import completed: docs=${ms.map(_.nDocs).sum} terms=${ms.map(_.nTerms).sum} " +
        s"postings=${ms.map(_.nPostings).sum} segments=${ms.size} out=${pos(1)}")
      0
    } catch {
      case e: Exception => runtimeErr(s"import failed: ${e.getMessage}")
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
