package graft.bench

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off diagnostic: per-stage wall/task-time of the segment build + batch
  * query at a given core count — shows which stages fail to scale.
  * Usage: StageDiag <cores> [replicas]
  */
object StageDiag {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val replicas = args.lift(1).map(_.toInt).getOrElse(128)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val spark = graft.spark.Sessions.local(cores, cores, s"graft-diag-$cores")
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val wall = (for {
          c <- info.completionTime; s <- info.submissionTime
        } yield c - s).getOrElse(-1L)
        val m = info.taskMetrics
        stages += ((info.name.take(60), wall, m.executorRunTime, m.jvmGCTime,
          m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead, info.numTasks))
      }
    })

    val out = Files.createTempDirectory(s"graft-diag-$cores").toString
    val (nDocs, buildSec, nq, querySec) = Workload.run(spark, sfDir, out, replicas, 300, buckets = 64)
    Thread.sleep(500)
    println(f"== cores=$cores docs=$nDocs build=$buildSec%.1fs queries=$nq query=$querySec%.1fs")
    println(f"${"stage"}%-60s ${"wallMs"}%8s ${"taskMs"}%9s ${"gcMs"}%7s ${"shufMB"}%7s ${"tasks"}%6s")
    stages.foreach { case (n, w, t, g, sb, k) =>
      println(f"$n%-60s $w%8d $t%9d $g%7d ${sb / 1e6}%7.0f $k%6d")
    }
    spark.stop()
  }
}
