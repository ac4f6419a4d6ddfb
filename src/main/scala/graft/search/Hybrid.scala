package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Hybrid lexical + vector retrieval — the reference's Phase 11a
  * ("Vector + hybrid retrieval", /root/reference/COMMERCIAL_ROADMAP.md:86-99,
  * 117: "One ingestion pipeline feeds two retrieval paths (keyword + vector),
  * combined at query time (hybrid)") delivered as an extension on top of the
  * two retrieval paths this engine already has: the BM25 dataflow scorer
  * (`SearchEngine`) and the embedding similarity operators
  * (`graft.pipeline.Similarity` — exact brute force and the IVF scale path).
  *
  * Fusion rule: Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR
  * 2009 — public method), computed in INTEGER micro-units so every engine
  * tier and the DuckDB oracle agree bit-for-bit:
  *
  *   rrf_r(doc) = Σ_legs  floor(1_000_000 / (rrfK + rank_leg(doc)))
  *
  * over the legs the doc appears in (rank 1-based within each leg's top-n;
  * absent leg contributes 0; standard rrfK = 60). floor(1e6/x) is strictly
  * decreasing in rank for x <= 1e6, so within-leg ordering is preserved —
  * this is the standard RRF up to a fixed monotone quantization, chosen over
  * float 1/(k+r) because integer sums have no summation-order or rounding
  * ambiguity across engines.
  *
  * Leg rank determinism: the lexical leg ranks by (score_micros desc, doc_id
  * asc) — the same micro-space re-rank discipline every oracle gate uses; the
  * vector leg ranks by (cos_micros desc, vec_id asc) — `Similarity`'s
  * ordering. Final order: (rrf_r desc, doc_id asc).
  *
  * Scale shape: each leg is a top-n TRUNCATION before the join —
  * `orderBy(...).limit(n)` plans TakeOrderedAndProject (per-partition heaps,
  * driver merge of n rows; no global sort) and the vector leg is the ANN
  * operator's own bounded output. The fusion join and the rank windows
  * therefore run on O(nLex + nVec) rows — constants, not functions of corpus
  * size — so the single-partition rank window is bounded work, not a scale
  * hazard. At 100 TB the vector leg swaps brute force for the IVF variant
  * (`hybridTopKIvf`) with identical fusion semantics.
  */
object Hybrid {

  /** floor(1e6 / (rrfK + rank)) when the leg rank is present (> 0), else 0.
    * Integer `div` keeps the arithmetic exact — DuckDB's `//` twin.
    */
  private def contrib(rankCol: String, rrfK: Int): String =
    s"(CASE WHEN $rankCol > 0 THEN 1000000 div ($rrfK + $rankCol) ELSE 0 END)"

  /** Lexical leg: BM25 candidates -> micro-space rank -> top nLex.
    * Output: (doc_id, lex_rank).
    */
  private def lexLeg(engine: SearchEngine, query: String, nLex: Int): DataFrame = {
    val w = Window.orderBy(col("score_r").desc, col("doc_id").asc)
    engine
      .scoredDF(query)
      .select(col("doc_id"), round(col("score") * lit(1e6)).cast("long").as("score_r"))
      .orderBy(col("score_r").desc, col("doc_id").asc)
      .limit(nLex)
      .withColumn("lex_rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
  }

  /** Fuse two ranked legs. `vecLeg` must be (doc_id, vec_rank) with 1-based
    * ranks. Output: (rank, doc_id, rrf_r, lex_rank, vec_rank) — absent-leg
    * ranks surface as 0 (not NULL) so downstream consumers and the oracle
    * hash identically.
    */
  private def fuse(lex: DataFrame, vec: DataFrame, k: Int, rrfK: Int): DataFrame = {
    val w = Window.orderBy(col("rrf_r").desc, col("doc_id").asc)
    lex
      .join(vec, Seq("doc_id"), "full_outer")
      .na.fill(0L, Seq("lex_rank", "vec_rank"))
      .withColumn("rrf_r", expr(s"${contrib("lex_rank", rrfK)} + ${contrib("vec_rank", rrfK)}"))
      .orderBy(col("rrf_r").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("rrf_r"), col("lex_rank"), col("vec_rank"))
  }

  /** Hybrid top-k with the EXACT vector leg (brute-force cosine — the
    * correctness twin). The query addresses the embedding table by
    * `queryVecId` (the embedding sidecar is keyed by doc_id); the vector leg
    * excludes the query row itself, per `Similarity.bruteForceTopK`.
    */
  def hybridTopK(
      engine: SearchEngine,
      emb: DataFrame,
      query: String,
      queryVecId: Long,
      k: Int,
      nLex: Int = 50,
      nVec: Int = 50,
      rrfK: Int = 60): DataFrame = {
    val vec = Similarity
      .bruteForceTopK(emb, Seq(queryVecId), nVec)
      .select(col("vec_id").as("doc_id"), col("rank").as("vec_rank"))
    fuse(lexLeg(engine, query, nLex), vec, k, rrfK)
  }

  /** Driver-side fusion twin for the pinned tiers: both legs as 1-based
    * (id, rank) lists (already truncated to their top-n), identical integer
    * RRF and final ordering. Output rows (rank, doc_id, rrf_r, lex_rank,
    * vec_rank) with 0 = absent leg — the same contract as `fuse`.
    */
  def fuseRanksLocal(
      lex: Seq[(Long, Long)],
      vec: Seq[(Long, Long)],
      k: Int,
      rrfK: Int = 60): Seq[(Long, Long, Long, Long, Long)] = {
    val lm = lex.toMap
    val vm = vec.toMap
    def c(r: Long): Long = if (r > 0) 1000000L / (rrfK + r) else 0L
    (lm.keySet ++ vm.keySet).toSeq
      .map { d =>
        val lr = lm.getOrElse(d, 0L)
        val vr = vm.getOrElse(d, 0L)
        (d, c(lr) + c(vr), lr, vr)
      }
      .sortBy { case (d, rrf, _, _) => (-rrf, d) }
      .take(k)
      .zipWithIndex
      .map { case ((d, rrf, lr, vr), i) => (i + 1L, d, rrf, lr, vr) }
  }

  /** Micro-space lexical leg from a full ranked candidate list — the local
    * twin of `lexLeg` (same (score_micros desc, doc_id asc) rank space).
    */
  def lexLegLocal(all: Seq[(Long, Double)], nLex: Int): Seq[(Long, Long)] =
    all
      .map { case (d, s) => (d, math.round(s * 1e6)) }
      .sortBy { case (d, sr) => (-sr, d) }
      .take(nLex)
      .zipWithIndex
      .map { case ((d, _), i) => d -> (i + 1L) }

  /** Serving-tier hybrid: the pinned WAND engine's full enumeration as the
    * lexical leg (micro re-rank, the oracle's rank space) + the pinned
    * `VecStore` brute leg, fused with the same integer RRF. One serving node
    * answers both legs from memory — the searchd model extended to Phase 11a.
    */
  def hybridServing(
      eng: SegmentSearch.ServingEngine,
      vs: VecStore,
      query: String,
      queryVecId: Long,
      k: Int,
      nLex: Int = 50,
      nVec: Int = 50,
      rrfK: Int = 60): Seq[(Long, Long, Long, Long, Long)] =
    fuseRanksLocal(
      lexLegLocal(eng.search(query, Int.MaxValue), nLex),
      vs.topK(queryVecId, nVec),
      k, rrfK)

  /** Serving hybrid with the IVF-bucketed vector leg (round 5): fusion
    * unchanged, the leg is `VecStore.ivfTopK` — bit-identical to
    * `Similarity.ivfTopK`, O(centroids + probed members) per request.
    */
  def hybridServingIvf(
      eng: SegmentSearch.ServingEngine,
      vs: VecStore,
      query: String,
      queryVecId: Long,
      k: Int,
      numCentroids: Int,
      nprobe: Int,
      nLex: Int = 50,
      nVec: Int = 50,
      rrfK: Int = 60): Seq[(Long, Long, Long, Long, Long)] =
    fuseRanksLocal(
      lexLegLocal(eng.search(query, Int.MaxValue), nLex),
      vs.ivfTopK(queryVecId, nVec, numCentroids, nprobe).map { case (rank, id, _) => (id, rank) },
      k, rrfK)

  /** Hybrid top-k with the IVF-bucketed vector leg — the 100 TB scale path
    * (fixed-count centroids, row-local assignment, probes broadcast; see
    * `Similarity.ivfTopK`). Identical fusion semantics; the leg itself is
    * approximate exactly as IVF is.
    */
  def hybridTopKIvf(
      engine: SearchEngine,
      emb: DataFrame,
      query: String,
      queryVecId: Long,
      k: Int,
      numCentroids: Int,
      nprobe: Int,
      nLex: Int = 50,
      nVec: Int = 50,
      rrfK: Int = 60): DataFrame = {
    val vec = Similarity
      .ivfTopK(emb, Seq(queryVecId), nVec, numCentroids, nprobe)
      .select(col("vec_id").as("doc_id"), col("rank").as("vec_rank"))
    fuse(lexLeg(engine, query, nLex), vec, k, rrfK)
  }
}
