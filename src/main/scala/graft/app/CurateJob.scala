package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.index.SegmentIndex
import graft.pipeline.Curate

/** The end-to-end corpus-curation job: scrub -> exact dedup -> near-dup
  * prune -> quality floor -> fresh SegmentIndex build, with the per-stage
  * funnel printed as the success summary (the line an orchestrator parses).
  *
  * Usage: CurateJob <docsParquet> <outIndexDir> [buckets] [--substring-cap=micros]
  *
  * `--substring-cap=` enables the optional substring-dup ceiling stage
  * (Curate stage 3b): drop docs whose distinct-window duplicated share
  * exceeds the cap in micros (verbatim-heavy near-copies LSH can miss).
  *
  * Input is a documents-shaped parquet (doc_id, text[, source, lang]); the
  * curated corpus also lands at `<outIndexDir>/curated` (parquet) so the
  * trained-on data is inspectable and re-usable. Exit codes: 2 = argument
  * error before any work, 3 = runtime precondition / failure.
  */
object CurateJob {
  private val Usage = "usage: CurateJob <docsParquet> <outIndexDir> [buckets] [--substring-cap=micros]"

  private def usageErr(msg: String): Int = {
    System.err.println(s"CurateJob: $msg")
    System.err.println(Usage)
    2
  }
  private def runtimeErr(msg: String): Int = { System.err.println(s"CurateJob: $msg"); 3 }

  def run(args: Array[String]): Int = {
    if (args.contains("--help")) { println(Usage); return 0 } // reference: usage on stdout, exit 0
    val flags = args.filter(_.startsWith("--")).toIndexedSeq
    val pos = args.filterNot(_.startsWith("--")).toIndexedSeq
    val unknown = flags.filterNot(_.startsWith("--substring-cap="))
    if (unknown.nonEmpty) return usageErr(s"unknown flag: ${unknown.head}")
    // -1 is the internal "stage disabled" sentinel — only the ABSENT flag may
    // produce it; an explicit --substring-cap=-1 is a user error, not a skip
    val subCapRaw = flags.collectFirst { case f if f.startsWith("--substring-cap=") =>
      f.stripPrefix("--substring-cap=").toLongOption.filter(_ >= 0L) }
    val subCap = subCapRaw match {
      case Some(None) => return usageErr("--substring-cap= must be a non-negative integer (micros)")
      case Some(Some(v)) => v
      case None => -1L
    }
    if (pos.length < 2) return usageErr("missing required <docsParquet> <outIndexDir>")
    if (pos.length > 3) return usageErr(s"unexpected argument: ${pos(3)}")
    val buckets = pos.lift(2) match {
      case None => 8
      case Some(b) => b.toIntOption.filter(_ > 0) match {
        case Some(v) => v
        case None => return usageErr(s"buckets must be a positive integer, got '$b'")
      }
    }
    if (!Files.exists(Paths.get(pos(0))))
      return runtimeErr(s"corpus path does not exist: ${pos(0)}")

    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
      else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-job")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(pos(0))
      val need = Seq("doc_id", "text").filterNot(c => docs.columns.map(_.toLowerCase).contains(c))
      if (need.nonEmpty) return runtimeErr(s"corpus is missing required column(s): ${need.mkString(", ")}")
      val (curated, f) = Curate.curate(docs, maxSubstringDupMicros = subCap)
      val curatedPath = s"${pos(1)}/curated"
      curated.write.mode("overwrite").parquet(curatedPath)
      val fresh = spark.read.parquet(curatedPath) // index from the materialized artifact
      SegmentIndex.build(fresh, pos(1), buckets)
      println(s"Curation completed: input=${f.input} piiRedactions=${f.piiRedactions} " +
        s"afterExactDedup=${f.afterExactDedup} afterNearDup=${f.afterNearDup} " +
        s"afterQuality=${f.afterQuality} out=${pos(1)}")
      0
    } catch {
      case e: Throwable => runtimeErr(s"curate job failed: ${e.getMessage}")
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
