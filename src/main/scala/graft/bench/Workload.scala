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
  def queries(spark: SparkSession, sfDir: String, count: Int): Seq[String] = {
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
      i % 4 match {
        case 0 => s"$a $b"
        case 1 => s"$a OR $b $c"
        case 2 => s"$a $b -$c"
        case _ => s"$a $b $c"
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
