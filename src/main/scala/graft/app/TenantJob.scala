package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.index.TenantCatalog

/** Spark-submit builder for a multi-tenant index catalog (the Phase 5
  * storage model, /root/reference/COMMERCIAL_ROADMAP.md:93 "per-tenant
  * index"): partitions a documents-shaped corpus (doc_id, text, source,
  * lang) by its tenant column and builds one SegmentIndex per tenant under
  * `<rootDir>/tenants/`, servable by [[TenantServer]].
  *
  * Usage: TenantJob <docsParquet> <rootDir> [buckets] [--tenant-col=NAME] [--code-aware] [--no-stage] [--add]
  *
  * `--no-stage` trusts the corpus to already be tenant-partitioned at its
  * source (steady state at 100 TB) and skips the staging copy. `--add`
  * treats the corpus as a DELTA: each tenant's rows append to its existing
  * index as new segments (new tenants bootstrap as builds) — the
  * daily-delta ingest shape, paired with the gateway's per-tenant /reload.
  *
  * Exit-code discipline matches the other job mains: 2 = argument error
  * (before any work), 3 = runtime precondition / failure.
  */
object TenantJob {
  private val Usage =
    "usage: TenantJob <docsParquet> <rootDir> [buckets] [--tenant-col=NAME] [--code-aware] [--no-stage] [--add]"

  private def usageErr(msg: String): Int = {
    System.err.println(s"TenantJob: $msg")
    System.err.println(Usage)
    2
  }
  private def runtimeErr(msg: String): Int = { System.err.println(s"TenantJob: $msg"); 3 }

  /** Validation + work; returns the process exit code (CliSpec-testable). */
  def run(args: Array[String]): Int = {
    if (args.contains("--help")) { println(Usage); return 0 } // reference: usage on stdout, exit 0
    val flags = args.filter(_.startsWith("--")).toIndexedSeq
    val pos = args.filterNot(_.startsWith("--")).toIndexedSeq

    val tenantCol = flags.collectFirst { case f if f.startsWith("--tenant-col=") =>
      f.stripPrefix("--tenant-col=")
    }
    val unknown = flags.filterNot(f =>
      f == "--code-aware" || f == "--no-stage" || f == "--add" || f.startsWith("--tenant-col="))
    if (unknown.nonEmpty) return usageErr(s"unknown flag: ${unknown.head}")
    if (tenantCol.exists(_.isEmpty)) return usageErr("--tenant-col= requires a column name")
    if (pos.length < 2) return usageErr("missing required <docsParquet> <rootDir>")
    if (pos.length > 3) return usageErr(s"unexpected argument: ${pos(3)}")
    val buckets = pos.lift(2) match {
      case None => 8
      case Some(b) => b.toIntOption.filter(_ > 0) match {
        case Some(v) => v
        case None => return usageErr(s"buckets must be a positive integer, got '$b'")
      }
    }
    val docsPath = pos(0)
    val rootDir = pos(1)
    val addMode = flags.contains("--add")
    if (!Files.exists(Paths.get(docsPath)))
      return runtimeErr(s"corpus path does not exist: $docsPath")
    if (addMode && !Files.isDirectory(Paths.get(rootDir, "tenants")))
      return runtimeErr(s"--add requires an existing tenant catalog at $rootDir (no tenants/ dir)")

    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
      else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-tenant-job")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(docsPath)
      val tcol = tenantCol.getOrElse("source")
      val need = Seq("doc_id", "text", tcol)
      val missing = need.filterNot(c => docs.columns.map(_.toLowerCase).contains(c.toLowerCase))
      if (missing.nonEmpty)
        return runtimeErr(s"corpus is missing required column(s): ${missing.mkString(", ")}")
      val run = if (addMode) TenantCatalog.addAll _ else TenantCatalog.buildAll _
      val counts = run(
        docs, rootDir, buckets, tcol, None,
        flags.contains("--code-aware"),
        !flags.contains("--no-stage"))
      val verb = if (addMode) "delta" else "completed"
      println(s"Tenant catalog $verb: tenants=${counts.size} docs=${counts.values.sum} out=$rootDir")
      0
    } catch {
      case e: Throwable => runtimeErr(s"tenant job failed: ${e.getMessage}")
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
