package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.index.SegmentIndex

/** Maintenance job, two modes (no re-tokenization in either — compaction
  * re-buckets the docstore's materialized tfmaps):
  *
  *   CompactJob <srcIndexDir> <dstIndexDir> [buckets]
  *     FULL rewrite into `buckets` balanced segments in a fresh directory
  *     (cost linear in the index; callers swap directories / hot-reload).
  *
  *   CompactJob --fold=b1,b2,... <indexDir>
  *   CompactJob --auto[=maxBytes] <indexDir>
  *     PARTIAL, IN PLACE: fold the listed (or size-tiered-picked) live
  *     buckets into one new bucket via SegmentIndex.compactBuckets — cost
  *     linear in the picked buckets only, the right maintenance op after
  *     many small incremental adds. --auto picks live buckets smaller than
  *     maxBytes (default 8 MiB), smallest first; exits 0 with "nothing to
  *     fold" when fewer than two qualify. Pair with the server's delta
  *     /reload.
  *
  * CLI discipline mirrors the reference's ordered validation matrix
  * (/root/reference/tests/test_cli_exit_codes.cpp:133-327): argument errors
  * — unknown flag, arity, bad buckets, src==dst (the flag-conflict analog) —
  * exit 2 with usage on stderr; runtime preconditions (src is not an index)
  * exit 3 before Spark starts.
  */
object CompactJob {
  private val Usage =
    "usage: CompactJob <srcIndexDir> <dstIndexDir> [buckets] | CompactJob --fold=b1,b2,... <indexDir> | CompactJob --auto[=maxBytes] <indexDir>"

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
    val unknown = flags.filterNot(f => f == "--auto" || f.startsWith("--auto=") || f.startsWith("--fold="))
    if (unknown.nonEmpty) return usageErr(s"unknown flag: ${unknown.head}")
    val fold = flags.collectFirst { case f if f.startsWith("--fold=") => f.stripPrefix("--fold=") }
    val auto = flags.collectFirst { case f if f == "--auto" => 8L << 20
                                    case f if f.startsWith("--auto=") => f.stripPrefix("--auto=").toLongOption.getOrElse(-1L) }
    if (fold.isDefined && auto.isDefined) return usageErr("--fold and --auto conflict")
    if (auto.exists(_ <= 0)) return usageErr("--auto=maxBytes must be a positive integer")
    if (fold.isDefined || auto.isDefined) {
      if (pos.length < 1) return usageErr("missing required <indexDir>")
      if (pos.length > 1) return usageErr(s"unexpected argument: ${pos(1)} (partial mode takes one dir)")
      val picks = fold.map(_.split(',').toSeq.map(_.trim)) match {
        case Some(parts) =>
          val ints = parts.map(_.toIntOption)
          if (parts.isEmpty || ints.exists(_.isEmpty))
            return usageErr(s"--fold= needs a comma-separated bucket list, got '${fold.get}'")
          if (ints.flatten.distinct.size != ints.size)
            return usageErr(s"--fold= has duplicate bucket ids: '${fold.get}'")
          Some(ints.flatten)
        case None => None
      }
      val dir = pos(0)
      if (!Files.exists(Paths.get(dir, "index_meta.json")))
        return runtimeErr(s"not an index (no index_meta.json): $dir")
      val spark =
        if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
        else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-job")
      spark.sparkContext.setLogLevel("WARN")
      try {
        val chosen = picks.getOrElse(SegmentIndex.pickFoldable(dir, auto.get))
        if (chosen.size < 2) { println(s"Compaction skipped: nothing to fold out=$dir"); return 0 }
        val m = SegmentIndex.compactBuckets(spark, dir, chosen)
        println(s"Partial compaction completed: folded=${chosen.sorted.mkString(",")} " +
          s"into=${m.bucket} docs=${m.nDocs} bytes=${m.bytes} out=$dir")
        return 0
      } catch {
        case e: Throwable => return runtimeErr(s"compact job failed: ${e.getMessage}")
      }
    }
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
