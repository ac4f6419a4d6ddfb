package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.index.HaystackExport

/** Migration job, outbound: export a graft segment index to the reference
  * engine's on-disk format (index_meta.json / docs.jsonl / postings.bin) so
  * an existing reference deployment can serve it — [[ImportJob]]'s inverse.
  *
  *   ExportJob <indexDir> <outHaystackDir>
  *
  * Same exit-code discipline as the other jobs: 2 usage, 3 runtime.
  */
object ExportJob {
  private val Usage = "usage: ExportJob <indexDir> <outHaystackDir>"

  private def usageErr(msg: String): Int = {
    System.err.println(s"ExportJob: $msg")
    System.err.println(Usage)
    2
  }
  private def runtimeErr(msg: String): Int = { System.err.println(s"ExportJob: $msg"); 3 }

  def run(args: Array[String]): Int = {
    if (args.contains("--help")) { println(Usage); return 0 }
    if (args.exists(_.startsWith("--"))) return usageErr(s"unknown flag: ${args.find(_.startsWith("--")).get}")
    if (args.length < 2) return usageErr("missing required <indexDir> <outHaystackDir>")
    if (args.length > 2) return usageErr(s"unexpected argument: ${args(2)}")
    if (!Files.exists(Paths.get(args(0), "index_meta.json")))
      return runtimeErr(s"not an index (no index_meta.json): ${args(0)}")
    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
      else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-export")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (docs, terms) = HaystackExport.exportIndex(spark, args(0), args(1))
      println(s"Export completed: docs=$docs terms=$terms out=${args(1)}")
      0
    } catch {
      case e: Exception => runtimeErr(s"export failed: ${e.getMessage}")
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
