package graft.bench

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** One-off diagnostic: per-stage wall/task-time of the segment build + batch
  * query at a given core count — shows which stages fail to scale. Runs the
  * workload TWICE (cold JIT inflates task times 3-5x) and reports the warm
  * pass; `util%` = taskMs / (wallMs * cores) — how busy the cores were while
  * the stage ran.
  * Usage: StageDiag <cores> [replicas]
  */
object StageDiag {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val replicas = args.lift(1).map(_.toInt).getOrElse(128)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // same IO layout as ScalingBench: index + shuffle on tmpfs so numbers
    // are comparable to the bench (and a shared VM disk doesn't pollute the
    // stage picture)
    val spark = graft.spark.Sessions
      .configure(org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.local.dir", "/dev/shm/graft-spark-local"), cores, s"graft-diag-$cores")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Long, Int, Long)]()
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        maxTask.merge(te.stageId, te.taskInfo.duration, math.max(_, _))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val wall = (for {
          c <- info.completionTime; s <- info.submissionTime
        } yield c - s).getOrElse(-1L)
        val m = info.taskMetrics
        stages += ((info.name.take(60), wall, m.executorRunTime, m.jvmGCTime,
          m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead, info.numTasks,
          maxTask.getOrDefault(info.stageId, -1L)))
      }
    })

    // warmup pass: JIT + classloading + parquet footer caches
    val warmOut = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), s"graft-diag-warm-$cores").toString
    Workload.run(spark, sfDir, warmOut, replicas, 100, buckets = 64)
    Thread.sleep(500)
    stages.clear()

    val out = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), s"graft-diag-$cores").toString
    val (nDocs, buildSec, nq, querySec) = Workload.run(spark, sfDir, out, replicas, 300, buckets = 64)
    Thread.sleep(500)
    println(f"== cores=$cores docs=$nDocs build=$buildSec%.1fs queries=$nq query=$querySec%.1fs (warm)")
    val stageWall = stages.map(_._2).sum
    println(f"stage wall total: $stageWall%d ms (build+query wall gaps = driver time)")
    println(f"${"stage"}%-60s ${"wallMs"}%8s ${"taskMs"}%9s ${"gcMs"}%7s ${"shufMB"}%7s ${"tasks"}%6s ${"util%%"}%6s ${"maxTask"}%8s")
    stages.foreach { case (n, w, t, g, sb, k, mt) =>
      val util = if (w > 0) 100.0 * t / (w.toDouble * cores) else 0.0
      println(f"$n%-60s $w%8d $t%9d $g%7d ${sb / 1e6}%7.0f $k%6d $util%5.0f%% $mt%8d")
    }
    spark.stop()
    // /dev/shm is RAM — never leave index temp dirs behind
    Seq(warmOut, out).foreach(d => scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf", d)).!))
  }
}
