package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (north_rule: throughput scaling
  * efficiency >= 0.8 going from N to 4N executors; in-sandbox evidenced as
  * the SAME job at local[8] vs local[32] on the SAME input).
  *
  * Runs the full index-build + batch-query workload at both parallelism
  * levels in one JVM (fresh SparkSession per level), computes
  *   efficiency = (throughput@32 / throughput@8) / (32 / 8)
  * for both build docs/sec and query QPS, and appends the results to
  * BENCH/BASELINE.md.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICAS", "64").toInt
    val nQueries = 1000
    val lo = 8
    val hi = 32

    // Bucket count is FIXED (the dataset layout must not change with cluster
    // size) — both levels run the IDENTICAL job; only resources differ.
    val buckets = 64

    def runAt(cores: Int, reps: Int, nq: Int): (Long, Double, Int, Double) = {
      val spark = graft.spark.Sessions.local(cores, cores, s"graft-scaling-$cores")
      spark.sparkContext.setLogLevel("WARN")
      val out = Files.createTempDirectory(s"graft-scale-$cores").toString
      try Workload.run(spark, sfDir, out, reps, nq, buckets = buckets)
      finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    // small warmup pass (JIT/classloading), then interleaved best-of-2 per
    // level — the sandbox VM's throughput drifts over minutes, so paired
    // measurements beat sequential ones.
    runAt(8, 2, 40)
    var (nDocsLo, buildLo, nqLo, queryLo) = (0L, Double.MaxValue, 0, Double.MaxValue)
    var (nDocsHi, buildHi, nqHi, queryHi) = (0L, Double.MaxValue, 0, Double.MaxValue)
    for (_ <- 1 to 2) {
      val (nL, bL, qnL, qL) = runAt(lo, replicas, nQueries)
      nDocsLo = nL; nqLo = qnL
      buildLo = math.min(buildLo, bL); queryLo = math.min(queryLo, qL)
      val (nH, bH, qnH, qH) = runAt(hi, replicas, nQueries)
      nDocsHi = nH; nqHi = qnH
      buildHi = math.min(buildHi, bH); queryHi = math.min(queryHi, qH)
    }
    require(nDocsLo == nDocsHi && nqLo == nqHi, "both levels must run the same input")

    val buildThrLo = nDocsLo / buildLo
    val buildThrHi = nDocsHi / buildHi
    val qpsLo = nqLo / queryLo
    val qpsHi = nqHi / queryHi
    val factor = hi.toDouble / lo
    val buildEff = (buildThrHi / buildThrLo) / factor
    val queryEff = (qpsHi / qpsLo) / factor

    val md =
      f"""## Scaling run — same job, same input, local[$lo] vs local[$hi]
         |
         |Input: $sfDir documents x$replicas replicas = $nDocsLo%,d docs; $nqLo BM25 top-10 queries (batch).
         |
         || metric | local[$lo] | local[$hi] | speedup | scaling efficiency (target >= 0.8 over 4x cores) |
         ||---|---|---|---|---|
         || segment index build (docs/sec) | ${buildThrLo.round}%,d | ${buildThrHi.round}%,d | ${buildThrHi / buildThrLo}%.2fx | $buildEff%.3f |
         || BM25 top-10 batch QPS (Spark fan-out) | $qpsLo%.1f | $qpsHi%.1f | ${qpsHi / qpsLo}%.2fx | $queryEff%.3f |
         |
         |Build wall: $buildLo%.2f s -> $buildHi%.2f s. Query wall: $queryLo%.2f s -> $queryHi%.2f s.
         |""".stripMargin

    Files.createDirectories(Paths.get("BENCH"))
    val path = Paths.get("BENCH/BASELINE.md")
    val header =
      if (Files.exists(path)) Files.readString(path)
      else
        """# BENCH/BASELINE — measured engine numbers
          |
          |North-rule gates (/root/repo/BASELINE.json): BM25 top-k QPS +
          |index-build throughput, rank-identical results, scaling efficiency
          |>= 0.8 from N to 4N parallelism (evidenced as local[8] vs local[32]
          |on identical input — no real cluster in this sandbox).
          |
          |""".stripMargin
    Files.writeString(path, header + "\n" + md)
    println(md)
  }
}
