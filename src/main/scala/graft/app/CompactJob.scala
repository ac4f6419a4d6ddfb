package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.index.SegmentIndex

/** Maintenance job: fold an index's accumulated delta segments into
  * `buckets` balanced segments in a fresh directory (no re-tokenization —
  * SegmentIndex.compact re-buckets the docstore's materialized tfmap).
  *
  * Usage: CompactJob <srcIndexDir> <dstIndexDir> [buckets]
  *
  * CLI discipline mirrors the reference's ordered validation matrix
  * (/root/reference/tests/test_cli_exit_codes.cpp:133-327): argument errors
  * — unknown flag, arity, bad buckets, src==dst (the flag-conflict analog) —
  * exit 2 with usage on stderr; runtime preconditions (src is not an index)
  * exit 3 before Spark starts.
  */
object CompactJob {
  private val Usage = "usage: CompactJob <srcIndexDir> <dstIndexDir> [buckets]"

  private def usageErr(msg: String): Int = {
    System.err.println(s"CompactJob: $msg")
    System.err.println(Usage)
    2
  }
  private def runtimeErr(msg: String): Int = { System.err.println(s"CompactJob: $msg"); 3 }

  /** Validation + work; returns the process exit code (CliSpec-testable). */
  def run(args: Array[String]): Int = {
    if (args.contains("--help")) { println(Usage); return 0 } // reference: usage on stdout, exit 0
    val flags = args.filter(_.startsWith("--")).toIndexedSeq
    val pos = args.filterNot(_.startsWith("--")).toIndexedSeq

    // --- exit-2 layer (flags -> arity -> values -> conflicts)
    if (flags.nonEmpty) return usageErr(s"unknown flag: ${flags.head}")
    if (pos.length < 2) return usageErr("missing required <srcIndexDir> <dstIndexDir>")
    if (pos.length > 3) return usageErr(s"unexpected argument: ${pos(3)}")
    val buckets = pos.lift(2) match {
      case None => 32
      case Some(b) => b.toIntOption.filter(_ > 0) match {
        case Some(v) => v
        case None => return usageErr(s"buckets must be a positive integer, got '$b'")
      }
    }
    val src = pos(0)
    val dst = pos(1)
    if (Paths.get(src).toAbsolutePath.normalize == Paths.get(dst).toAbsolutePath.normalize)
      return usageErr("srcIndexDir and dstIndexDir must differ (compaction swaps directories)")

    // --- exit-3 layer (runtime preconditions, before Spark starts)
    if (!Files.exists(Paths.get(src, "index_meta.json")))
      return runtimeErr(s"source is not an index (no index_meta.json): $src")

    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
      else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-job")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val manifests = SegmentIndex.compact(spark, src, dst, buckets)
      println(s"Compaction completed: buckets=${manifests.size} " +
        s"docs=${manifests.map(_.nDocs).sum} bytes=${manifests.map(_.bytes).sum} out=$dst")
      0
    } catch {
      case e: Throwable => runtimeErr(s"compact job failed: ${e.getMessage}")
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
