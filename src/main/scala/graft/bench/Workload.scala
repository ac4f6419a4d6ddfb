package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared benchmark workload pieces (used by Bench and ScalingBench so both
  * parallelism levels run EXACTLY the same job on the same input).
  */
object Workload {

  /** Deterministic query set over the corpus's own most-frequent terms:
    * a mix of 2-3 term AND, OR, and NOT queries (seeded, no wall clock).
    */
  def queries(spark: SparkSession, sfDir: String, count: Int): Seq[String] =
    queries(spark, sfDir, count, "mixed")

  /** mode: "mixed" = dense+rare analytical batch; "selective" = every query
    * anchored by a rare term (the interactive-serving shape); "zipf" =
    * `count` requests Zipf(s=1)-sampled from a 64-query mixed pool — the
    * head-heavy repeated-traffic shape of real search logs (the workload a
    * Phase-7 result cache exists for). Deterministic: seeded pool + seeded
    * rank draws, no wall clock.
    */
  def queries(spark: SparkSession, sfDir: String, count: Int, mode: String): Seq[String] = {
    if (mode == "zipf") {
      val pool = queries(spark, sfDir, 64, "mixed").toIndexedSeq
      val rnd = new scala.util.Random(4242)
      // cumulative 1/r weights; binary search per draw
      val cum = pool.indices.map(r => 1.0 / (r + 1)).scanLeft(0.0)(_ + _).tail
      val total = cum.last
      return (0 until count).map { _ =>
        val x = rnd.nextDouble() * total
        var lo = 0; var hi = cum.length - 1
        while (lo < hi) { val mid = (lo + hi) >>> 1; if (cum(mid) < x) lo = mid + 1 else hi = mid }
        pool(lo)
      }
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val terms = graft.index.IndexBuilder
      .build(docs)
      .dfTable
      .orderBy(col("df").desc, col("term").asc)
      .limit(24)
      .collect()
      .map(_.getString(0))
      .toIndexedSeq
    val rnd = new scala.util.Random(42)
    (0 until count).map { i =>
      val a = terms(rnd.nextInt(terms.size))
      val b = terms(rnd.nextInt(terms.size))
      val c = terms(rnd.nextInt(terms.size))
      val rare = s"uq${rnd.nextInt(50021)}"
      val branch = if (mode == "selective") 4 + (i % 3) else i % 8
      branch match {
        case 0 => s"$a $b"          // dense AND
        case 1 => s"$a OR $b $c"    // dense OR
        case 2 => s"$a $b -$c"      // dense AND + NOT
        case 3 => s"$a $b $c"       // dense 3-way AND
        case 4 => s"$rare $a"       // selective AND (rare term drives)
        case 5 => s"$rare OR $b"    // rare OR dense
        case 6 => s"$rare $a -$b"   // selective AND + NOT
        case _ => s"$a $b"          // dense AND
      }
    }
  }

  /** Deterministically replicate the corpus `times`x (distinct doc_ids) so
    * the build is large enough for parallel-scaling measurement at local SF.
    * Same expression both runs => identical input rows.
    */
  def replicatedDocs(spark: SparkSession, sfDir: String, times: Int): DataFrame = {
    // repartition BEFORE the crossJoin so replication itself runs in
    // parallel (the tiny source parquet is otherwise a single scan task)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val n = 1000000L // id stride — far above any test-corpus max id
    docs
      .crossJoin(spark.range(times.toLong).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * n).as("doc_id"), col("text"))
      // Zipf-ish tail: one selective token per doc (df ~ nDocs/50021) so the
      // query mix can include realistic rare-term conjunctions — a uniform
      // dense vocabulary alone is the pessimal pure-scan case.
      .withColumn("text", concat(col("text"), lit(" uq"), pmod(col("doc_id"), lit(50021L))))
  }

  /** Fraction of host CPU busy over `sampleMs`, from /proc/stat deltas —
    * measures CO-TENANT activity the instant before a run (our own load is
    * idle while we sample). loadavg is useless here: it decays over minutes
    * and still carries OUR just-finished run.
    */
  def hostBusyFrac(sampleMs: Long = 2000): Double = {
    def snap(): (Long, Long) = {
      // Files.readString, not scala.io.Source: Source leaks the descriptor
      // unless explicitly closed, and awaitQuietHost polls this in a loop.
      val l = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.next()
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      val idle = f(3) + f(4) // idle + iowait
      (f.sum, idle)
    }
    val (t0, i0) = snap()
    Thread.sleep(sampleMs)
    val (t1, i1) = snap()
    val dt = (t1 - t0).toDouble
    if (dt <= 0) 0.0 else 1.0 - (i1 - i0) / dt
  }

  /** Block until co-tenants leave the box mostly idle (or the cap expires —
    * then run anyway and let best-of-N pick a cleaner round). The sandbox
    * VM's co-tenants run in bursts of minutes; measuring into a burst
    * produces nonsense (observed: a "pure-CPU 2->8 thread scaling ceiling"
    * of 7.6x — above the 4x physical ideal — purely from a burst ending
    * mid-measurement).
    */
  def awaitQuietHost(
      label: String,
      capMs: Long = sys.env.getOrElse("SPARK_GRAFT_QUIET_CAP_MS", "240000").toLong
  ): Unit = {
    val t0 = System.currentTimeMillis()
    var busy = hostBusyFrac()
    while (busy > 0.12 && System.currentTimeMillis() - t0 < capMs) {
      Console.err.println(f"[bench] host ${busy * 100}%.0f%% busy (co-tenants) — waiting before $label")
      Thread.sleep(8000)
      busy = hostBusyFrac()
    }
  }

  def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** best wall-clock of n repetitions (throughput claims on a noisy VM). */
  def bestOf[T](n: Int)(body: => T): Double =
    (1 to n).map(_ => timed(body)._2).min

  /** One full measured pass: segment build (on the replicated corpus) +
    * distributed batch query. Returns (docsIndexed, buildSec, nQueries,
    * querySec).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String, replicas: Int, nQueries: Int, buckets: Int): (Long, Double, Int, Double) = {
    val docs = replicatedDocs(spark, sfDir, replicas)
    val (manifests, buildSec) = timed {
      graft.index.SegmentIndex.build(docs, outDir, buckets)
    }
    val nDocs = manifests.map(_.nDocs).sum
    val qs = queries(spark, sfDir, nQueries)
    graft.search.SegmentSearch.searchBatch(spark, outDir, qs.take(20), k = 10) // warm caches/JIT
    val querySec = bestOf(3) {
      graft.search.SegmentSearch.searchBatch(spark, outDir, qs, k = 10)
    }
    (nDocs, buildSec, qs.size, querySec)
  }
}
