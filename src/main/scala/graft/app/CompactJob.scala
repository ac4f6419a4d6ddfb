package graft.app

import org.apache.spark.sql.SparkSession

import graft.index.SegmentIndex

/** Maintenance job: fold an index's accumulated delta segments into
  * `buckets` balanced segments in a fresh directory (no re-tokenization —
  * SegmentIndex.compact re-buckets the docstore's materialized tfmap).
  *
  * Usage: CompactJob <srcIndexDir> <dstIndexDir> [buckets]
  * Exit codes: 0 ok, 2 usage, 3 failure.
  */
object CompactJob {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: CompactJob <srcIndexDir> <dstIndexDir> [buckets]")
      sys.exit(2)
    }
    val src = args(0)
    val dst = args(1)
    val buckets = args.lift(2).flatMap(_.toIntOption).getOrElse(32)

    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
      else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-job")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val manifests = SegmentIndex.compact(spark, src, dst, buckets)
      println(s"Compaction completed: buckets=${manifests.size} " +
        s"docs=${manifests.map(_.nDocs).sum} bytes=${manifests.map(_.bytes).sum} out=$dst")
    } catch {
      case e: Throwable => System.err.println(s"compact job failed: ${e.getMessage}"); sys.exit(3)
    }
  }
}
