package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.QueryParser

/** Learning-to-rank — the reference roadmap's optional Phase 10
  * ("Masterclass Features: Synonyms, LTR, advanced ranking",
  * /root/reference/README.md:65). A clearly-separated EXTENSION: the
  * normative BM25 chain is untouched; LTR consumes its output as one
  * feature among several and re-ranks.
  *
  * Two halves, in the shape a 100 TB training pipeline needs them:
  *
  *  1. '''Feature extraction + linear re-rank''' in INTEGER space
  *     ([[featuresDF]] / [[rerankDF]]): per OR-candidate features are exact
  *     integers (BM25 micros, matched-term count, doc length, tf sums), the
  *     model is an integer-weight linear combination, so every tier and the
  *     DuckDB oracle agree bit-for-bit — the same micro-unit discipline as
  *     every other gate. Scale shape: features fall out of the posting rows
  *     the scorer already reads (one extra `groupBy(doc_id)` co-partitioned
  *     with the scoring aggregation — candidates-sized, not corpus-sized),
  *     and the re-rank is `TakeOrderedAndProject` (per-partition heaps +
  *     driver merge; no global sort, no single-task window).
  *
  *  2. '''Distributed pointwise trainer''' ([[fit]]): ridge regression by
  *     normal equations — ONE aggregation pass computes every `Σ xᵢxⱼ` /
  *     `Σ xᵢy` moment with map-side combine (d features → O(d²) doubles
  *     shuffled to the driver, independent of row count: the canonical
  *     scalable linear-model fit), then the (d+1)×(d+1) system is solved on
  *     the driver by Gaussian elimination with partial pivoting. Training
  *     data volume never moves; only the moment matrix does.
  *
  * Float vs integer: training is float (labels are judgments, coefficients
  * are real); SERVING is integer (weights quantized to longs by the caller,
  * e.g. `round(w * 1e6)` over micro-features) so ranked output stays
  * deterministic and oracle-checkable.
  */
object Ltr {

  /** Integer model weights over the [[featuresDF]] columns. The score is
    * `Σ wᵢ · fᵢ` as exact long arithmetic (Spark ANSI overflow guards it
    * loudly; micro-scale features and small weights leave ~5 orders of
    * headroom under Long.MaxValue).
    */
  final case class Weights(
      wBm25: Long,
      wMatched: Long,
      wDl: Long,
      wTfSum: Long,
      wMaxTf: Long)

  /** All feature columns, in the fixed order [[fit]] and the specs use. */
  val FeatureCols: Seq[String] =
    Seq("f_bm25_r", "f_matched", "f_dl", "f_tfsum", "f_maxtf")

  /** Per-candidate integer feature vector for `query` (positive terms in OR
    * mode — candidates that match ANY term, so coverage features vary):
    *
    *   - `f_bm25_r`   BM25 score in micros (the gate unit)
    *   - `f_matched`  distinct positive query terms present in the doc
    *   - `f_dl`       document length in tokens
    *   - `f_tfsum`    Σ tf over the matched query terms
    *   - `f_maxtf`    max tf over the matched query terms
    *
    * Plan: the BM25 leg is the engine's own `scoredDF`; the coverage leg is
    * one `groupBy(doc_id)` over the SAME pushed-down posting scan
    * (`term IN (...)` reaches parquet), joined on doc_id. Both sides hash
    * by doc_id, so the join co-partitions with no extra wide exchange of
    * corpus-sized data.
    */
  def featuresDF(engine: SearchEngine, query: String): DataFrame = {
    val pq = QueryParser.parse(query)
    val orPq = pq.copy(isOr = true)
    val scored = engine.scoredDF(orPq)
    val distinctTerms = pq.terms.distinct
    val feats = engine.index.postings
      .filter(col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("f_matched"), // posting rows are unique per (term, doc)
        max(col("dl")).cast("long").as("f_dl"),
        sum(col("tf")).cast("long").as("f_tfsum"),
        max(col("tf")).cast("long").as("f_maxtf"))
    scored
      .join(feats, Seq("doc_id"))
      .select(
        col("doc_id"),
        round(col("score") * lit(1e6)).cast("long").as("f_bm25_r"),
        col("f_matched"),
        col("f_dl"),
        col("f_tfsum"),
        col("f_maxtf"))
  }

  /** Linear re-rank of a [[featuresDF]] frame: exact-integer model score,
    * ranked (ltr_r desc, doc_id asc), top-k via orderBy+limit
    * (TakeOrderedAndProject) with ranks assigned over the <= k survivors.
    */
  def rerankDF(feats: DataFrame, w: Weights, k: Int): DataFrame = {
    val ltr =
      lit(w.wBm25) * col("f_bm25_r") +
        lit(w.wMatched) * col("f_matched") +
        lit(w.wDl) * col("f_dl") +
        lit(w.wTfSum) * col("f_tfsum") +
        lit(w.wMaxTf) * col("f_maxtf")
    val top = feats
      .select(col("doc_id"), ltr.as("ltr_r"))
      .orderBy(col("ltr_r").desc, col("doc_id").asc)
      .limit(k)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("ltr_r").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(win).cast("long"))
      .select(col("rank"), col("doc_id"), col("ltr_r"))
  }

  /** Pointwise ridge regression over `data`: minimizes
    * `Σ (y - w·x - b)² + lambda · ‖w‖²` (intercept unpenalized — standard).
    * Returns `(intercept, coefficients in featureCols order)`.
    *
    * Distributed moments, driver solve: one `agg` computes `Σ xᵢxⱼ`,
    * `Σ xᵢ`, `Σ xᵢy`, `Σ y`, `n` (map-side combine — O(d²) doubles cross
    * the wire regardless of row count), then the driver solves the
    * (d+1)×(d+1) normal equations by Gaussian elimination with partial
    * pivoting. Exact for exactly-linear labels at lambda = 0
    * (spec-asserted); for 100 TB training frames nothing but the moment
    * matrix ever leaves the executors.
    */
  def fit(
      data: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      lambda: Double = 0.0): (Double, Array[Double]) = {
    require(featureCols.nonEmpty, "at least one feature column")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val d = featureCols.size
    val xs = featureCols.map(c => col(c).cast("double"))
    val y = col(labelCol).cast("double")

    // moment aggregates, fixed order: n, Σxᵢ (d), Σxᵢxⱼ for i<=j (d(d+1)/2),
    // Σy, Σxᵢy (d)
    val aggs =
      Seq(count(lit(1)).cast("double")) ++
        xs.map(sum) ++
        (0 until d).flatMap(i => (i until d).map(j => sum(xs(i) * xs(j)))) ++
        Seq(sum(y)) ++
        xs.map(x => sum(x * y))
    val row = data.agg(aggs.head, aggs.tail: _*).head()
    var p = 0
    def next(): Double = { val v = row.getDouble(p); p += 1; v }
    val n = next()
    require(n > 0.0, "fit needs at least one row")
    val sx = Array.fill(d)(next())
    val sxx = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val v = next(); sxx(i)(j) = v; sxx(j)(i) = v
    }
    val sy = next()
    val sxy = Array.fill(d)(next())

    // augmented system over [intercept, w_1..w_d]
    val m = d + 1
    val a = Array.ofDim[Double](m, m + 1)
    a(0)(0) = n
    for (i <- 0 until d) { a(0)(i + 1) = sx(i); a(i + 1)(0) = sx(i) }
    for (i <- 0 until d; j <- 0 until d)
      a(i + 1)(j + 1) = sxx(i)(j) + (if (i == j) lambda else 0.0)
    a(0)(m) = sy
    for (i <- 0 until d) a(i + 1)(m) = sxy(i)

    // Gaussian elimination, partial pivoting
    for (c <- 0 until m) {
      var piv = c
      for (r <- c + 1 until m) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      val t = a(c); a(c) = a(piv); a(piv) = t
      require(math.abs(a(c)(c)) > 1e-12,
        s"singular normal equations at column $c (collinear features? add ridge lambda)")
      for (r <- 0 until m if r != c) {
        val f = a(r)(c) / a(c)(c)
        if (f != 0.0) for (k <- c until m + 1) a(r)(k) -= f * a(c)(k)
      }
    }
    val sol = Array.tabulate(m)(i => a(i)(m) / a(i)(i))
    (sol(0), sol.drop(1))
  }
}
