package graft.app

import graft.sources.SourceTable
import graft.spark.Sessions

/** Writes a deterministic synthetic source table (input_hint shape) to
  * parquet — the in-sandbox stand-in for the production Iceberg table.
  *
  * Usage: SourceGen <outParquet> <rows>
  */
object SourceGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: SourceGen <outParquet> <rows>")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, 8, "graft-srcgen")
    spark.sparkContext.setLogLevel("WARN")
    SourceTable.synthetic(spark, args(1).toLong).write.mode("overwrite").parquet(args(0))
    println(s"wrote ${args(1)} source rows to ${args(0)}")
    spark.stop()
  }
}
