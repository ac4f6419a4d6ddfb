package graft.bench

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.index.SegmentIndex
import graft.search.SegmentSearch

/** Optimization-round instrumentation (guide §1): the EXACT Bench workload
  * with a stage listener, so build/query wall-clock attributes to stages
  * (and the gaps between stage wall and phase wall attribute to the driver).
  * Separate main — `graft.Bench` is the frozen graded harness and stays
  * untouched. Prints per-phase stage tables for (cold build, warm build,
  * cold distributed query, warm distributed query).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.spark.Sessions
      .configure(org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.local.dir", "/dev/shm/graft-spark-local"), cpus, "graft-bench-extra")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(name: String, wallMs: Long, taskMs: Long, gcMs: Long, shufMB: Double, tasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val wall = (for { c <- info.completionTime; s <- info.submissionTime } yield c - s).getOrElse(-1L)
        val m = info.taskMetrics
        stages.synchronized {
          stages += St(info.name.take(70), wall, m.executorRunTime, m.jvmGCTime,
            (m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.localBytesRead) / 1e6,
            info.numTasks)
        }
      }
    })

    def phase[T](label: String)(body: => T): T = {
      stages.synchronized(stages.clear())
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      println(f"%n== $label%-28s wall ${wall}%7.3f s")
      println(f"   ${"stage"}%-70s ${"wallMs"}%7s ${"taskMs"}%8s ${"gcMs"}%6s ${"shufMB"}%7s ${"tasks"}%5s")
      val snap = stages.synchronized(stages.toVector)
      snap.foreach { s =>
        println(f"   ${s.name}%-70s ${s.wallMs}%7d ${s.taskMs}%8d ${s.gcMs}%6d ${s.shufMB}%7.1f ${s.tasks}%5d")
      }
      println(f"   stage wall sum ${snap.map(_.wallMs).sum / 1e3}%.3f s of ${wall}%.3f s phase wall (rest = driver/JIT)")
      r
    }

    val out = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft-bx-idx").toString
    val replicas = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICAS", "32").toInt
    val docs = Workload.replicatedDocs(spark, sfDir, replicas)
    Workload.awaitQuietHost("bx build", capMs = 120000)

    phase("build COLD")(SegmentIndex.build(docs, out, buckets = cpus))
    val outWarm = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft-bx-warm").toString
    phase("build WARM")(SegmentIndex.build(docs, outWarm, buckets = cpus))
    scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf", outWarm)).!)

    val qs = Workload.queries(spark, sfDir, 200)
    Workload.awaitQuietHost("bx query", capMs = 60000)
    phase("query COLD distributed")(SegmentSearch.searchBatch(spark, out, qs, k = 10))
    phase("query WARM distributed")(SegmentSearch.searchBatch(spark, out, qs, k = 10))
    phase("query WARM distributed 2")(SegmentSearch.searchBatch(spark, out, qs, k = 10))

    val meta = SegmentIndex.readMeta(out)
    val segs = SegmentIndex.liveSegmentFiles(out).map(SegmentIndex.loadSegment(_))
    SegmentSearch.searchBatchInMemory(segs, meta, qs, 10) // JIT
    val memSec = Workload.bestOf(3)(SegmentSearch.searchBatchInMemory(segs, meta, qs, k = 10))
    println(f"%n== in-memory best-of-3: ${memSec}%.3f s (${qs.size / memSec}%.0f qps)")

    spark.stop()
    scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf", out)).!)
  }
}
