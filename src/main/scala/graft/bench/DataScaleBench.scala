package graft.bench

import java.nio.file.{Files, Paths}

/** Data-linearity evidence: the SAME job at the SAME parallelism on 1x vs 4x
  * input (weak scaling in DATA, the complement of ScalingBench's scaling in
  * CORES). Buckets grow with the corpus (64 -> 256) so per-segment size — the
  * thing a 1000-executor cluster holds constant by adding partitions — stays
  * fixed, exactly how the layout extrapolates to 100 TB.
  *
  * Expectation at scale: build THROUGHPUT (docs/s) stays flat as data grows
  * (every stage is per-partition work + one range exchange whose volume is
  * linear in the corpus); per-QUERY cost grows with posting-list length on
  * dense terms (inherent — more matching docs per query), so query is
  * reported as observed with that framing, not claimed flat.
  *
  * Interleaved rounds (1x, 4x, 1x, 4x) under the quiet-host gate so
  * co-tenant drift cancels pairwise; reports the best round per size and the
  * PAIRED throughput ratios.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_DATASCALE_ROUNDS
  * (default 2).
  */
object DataScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_DATASCALE_ROUNDS", "2").toInt
    val spark = graft.spark.Sessions.local(32, 64, "graft-datascale")
    spark.sparkContext.setLogLevel("WARN")

    def freshDir(tag: String): String =
      Files.createTempDirectory(Paths.get("/dev/shm"), s"graft-ds-$tag").toString
    // /dev/shm is RAM — a leaked index dir (two of the five are 256-replica
    // builds) stays resident after the JVM exits; delete as soon as the
    // round's queries are done
    def withDir[T](tag: String)(f: String => T): T = {
      val out = freshDir(tag)
      try f(out)
      finally scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf", out)).!)
    }

    // warm JIT/codegen on a small build + query before any measured round
    withDir("warm")(out => Workload.run(spark, sfDir, out, replicas = 8, nQueries = 50, buckets = 16))

    final case class Sample(nDocs: Long, buildSec: Double, nq: Int, querySec: Double) {
      def buildRate: Double = nDocs / buildSec
      def qps: Double = nq / querySec
    }
    def one(replicas: Int, buckets: Int, tag: String): Sample = {
      Workload.awaitQuietHost(s"datascale $tag", capMs = 300000)
      val (n, b, nq, q) =
        withDir(tag)(out => Workload.run(spark, sfDir, out, replicas, nQueries = 200, buckets = buckets))
      println(f"[datascale] $tag%s: docs=$n%,d build=$b%.2f s (${n / b}%,.0f docs/s) query=$q%.2f s (${nq / q}%.1f qps)")
      Sample(n, b, nq, q)
    }

    val pairs = (1 to rounds).map { r =>
      (one(64, 64, s"round $r 1x"), one(256, 256, s"round $r 4x"))
    }
    // best per METRIC independently — the round with the best build is not
    // necessarily the round with the best query wall
    val best1 = pairs.map(_._1).maxBy(_.buildRate)
    val best4 = pairs.map(_._2).maxBy(_.buildRate)
    val bestQ1 = pairs.map(_._1).maxBy(_.qps)
    val bestQ4 = pairs.map(_._2).maxBy(_.qps)
    // paired per-round throughput ratios (4x rate / 1x rate); 1.0 = perfectly flat
    val buildRatios = pairs.map { case (a, b) => b.buildRate / a.buildRate }.sorted
    val queryRatios = pairs.map { case (a, b) => b.qps / a.qps }.sorted
    // true median: mean of the middle two on even-length lists (with the
    // default rounds=2, taking xs(size/2) would report the BETTER sample)
    def median(xs: Seq[Double]) =
      if (xs.size % 2 == 1) xs(xs.size / 2) else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2.0

    // NOTE: replaceSection CLOBBERS the whole section — BENCH/BASELINE.md's
    // current body carries hand-written turbulence-aware interpretation over
    // multiple runs; re-add it after any rerun (the BenchReport gotcha).
    val md =
      f"""## Data linearity — same job, same 32 cores, 1x vs 4x corpus (weak scaling in data)
         |
         |Buckets grow with the corpus (64 -> 256) so per-segment size stays fixed —
         |the 100 TB layout discipline (a cluster adds partitions, not bigger ones).
         |Interleaved rounds under the quiet-host gate; paired ratios cancel drift.
         |
         || corpus | docs | best build | docs/s | best query (200 q) | qps |
         ||---|---|---|---|---|---|
         || 1x | ${best1.nDocs}%,d | ${best1.buildSec}%.2f s | ${best1.buildRate}%,.0f | ${bestQ1.querySec}%.2f s | ${bestQ1.qps}%.1f |
         || 4x | ${best4.nDocs}%,d | ${best4.buildSec}%.2f s | ${best4.buildRate}%,.0f | ${bestQ4.querySec}%.2f s | ${bestQ4.qps}%.1f |
         |
         |Paired per-round BUILD throughput ratios (4x/1x, 1.0 = perfectly
         |data-linear): ${buildRatios.map(r => f"$r%.2f").mkString(", ")} — median ${median(buildRatios)}%.2f.
         |Query qps ratios: ${queryRatios.map(r => f"$r%.2f").mkString(", ")} (dense-term posting
         |lists are 4x longer at 4x corpus, so per-query WORK grows with data by
         |design — the relevant scale lever for query is ScalingBench's core
         |scaling + segment-parallel fan-out, not data-flat qps).
         |""".stripMargin
    BenchReport.replaceSection("## Data linearity — same job, same 32 cores, 1x vs 4x corpus (weak scaling in data)", md)
    println(md)
    spark.stop()
  }
}
