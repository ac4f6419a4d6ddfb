package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: IVF — vectors are
  * bucketed to their nearest centroid once at index time; a query probes only
  * the `nprobe` closest cells, turning the O(N) scan into O(N * nprobe / C).
  *
  * Scale shape (the part that must survive 100 TB):
  *   - the centroid table is a FIXED-size deterministic subset (first
  *     `numCentroids` vectors by vec_id — a stand-in for k-means seeds; a real
  *     deployment swaps in trained centroids without changing the plan), so
  *     it is O(k) however large N grows;
  *   - cell assignment is ROW-LOCAL: the centroid list is collected once
  *     (O(k * dim)) and folded over per row as a literal array — no N x C
  *     crossJoin, no window, ZERO shuffle for the assignment of N vectors;
  *   - probe membership joins broadcast the tiny (query x nprobe) probe table
  *     into the assignment scan, so candidate selection is shuffle-free too;
  *     the only exchange on the query path is the final per-query top-k.
  *
  * All cosines are emitted as integer micro-units, and every ordering uses
  * (cos_micros DESC, vec_id ASC) so ranking is engine-independent.
  */
object Similarity {

  /** (vec_id, e array<double>, nrm double) */
  def prepared(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(col("e"), lit(0.0), (acc, x) => acc + x * x)))

  private def cosMicros(aE: String, aN: String, bE: String, bN: String) =
    round(
      aggregate(zip_with(col(aE), col(bE), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        / (col(aN) * col(bN)) * lit(1e6)
    ).cast("long")

  /** Exact brute-force top-k neighbors for the query vectors (by vec_id).
    * Output: (query_id, rank, vec_id, cos_micros).
    */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val v = prepared(emb)
    val q = v.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = q
      .join(v, col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        cosMicros("qe", "qn", "e", "nrm").as("cos_micros")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_micros").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_micros"))
  }

  /** One collected centroid: (centroid_id, vector, norm). */
  final case class Centroid(cid: Long, ce: Seq[Double], cn: Double)

  /** Deterministic fixed-count centroids: the first `numCentroids` vectors by
    * vec_id, collected to the driver (O(k * dim) — k is a constant, never a
    * function of N).
    */
  def centroids(v: DataFrame, numCentroids: Int): Seq[Centroid] =
    v.orderBy(col("vec_id")).limit(numCentroids)
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toSeq

  /** Row-local nearest-centroid expression over columns (e, nrm): folds the
    * literal centroid array keeping the best (cos_micros DESC, cid ASC) —
    * no join, no window, no shuffle. Returns the winning centroid_id.
    */
  private def nearestCentroid(cents: Seq[Centroid]): Column = {
    val arr = typedLit(cents.map(c => (c.cid, c.ce, c.cn)))
    val best = aggregate(
      arr,
      struct(lit(Long.MinValue).as("cm"), lit(Long.MaxValue).as("cid")),
      (acc, c) => {
        val cm = round(
          aggregate(zip_with(col("e"), c.getField("_2"), (x, y) => x * y), lit(0.0), (a, x) => a + x)
            / (col("nrm") * c.getField("_3")) * lit(1e6)
        ).cast("long")
        when(
          cm > acc.getField("cm") ||
            (cm === acc.getField("cm") && c.getField("_1") < acc.getField("cid")),
          struct(cm.as("cm"), c.getField("_1").cast("long").as("cid"))
        ).otherwise(acc)
      }
    )
    best.getField("cid")
  }

  /** IVF cell assignment: every vector to its best centroid by
    * (cos_micros DESC, centroid_id ASC), computed row-locally against the
    * fixed centroid literal. Output: (vec_id, centroid_id) — zero shuffle.
    */
  def ivfAssign(emb: DataFrame, numCentroids: Int): DataFrame = {
    val v = prepared(emb)
    ivfAssignPrepared(v, centroids(v, numCentroids)).select(col("vec_id"), col("centroid_id"))
  }

  /** Assignment carrying the vector columns (for joins that need them). */
  private def ivfAssignPrepared(v: DataFrame, cents: Seq[Centroid]): DataFrame =
    v.withColumn("centroid_id", nearestCentroid(cents))

  /** IVF-probed ANN: probe the `nprobe` best cells for each query, rank only
    * their member vectors. Output: (query_id, rank, vec_id, cos_micros).
    */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, numCentroids: Int, nprobe: Int): DataFrame = {
    // No persist: `prepared` is a row-local map over the parquet scan — the
    // centroid collect and the two result branches each re-scan, which is
    // cheaper at scale than pinning N x dim doubles in executor storage
    // (and the q branch's isin filter pushes down to its own scan).
    val v = prepared(emb)
    val cents = centroids(v, numCentroids)
    val assign = ivfAssignPrepared(v, cents)

    val q = v.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))

    // probes: |queries| x |cents| rows total — a per-query window over a
    // literal-sized centroid table, never a function of N
    val centsDf = {
      val spark = emb.sparkSession
      import spark.implicits._
      cents.map(c => (c.cid, c.ce, c.cn)).toDF("centroid_id", "ce", "cn")
    }
    val probes = {
      val scored = q
        .crossJoin(broadcast(centsDf))
        .select(col("query_id"), col("centroid_id"), cosMicros("qe", "qn", "ce", "cn").as("cm"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cm").desc, col("centroid_id").asc)
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= nprobe)
        .select(col("query_id"), col("centroid_id"))
    }

    // candidate members: broadcast the tiny probe table into the assignment
    // scan (no shuffle of the N-row side), then broadcast the queries in
    val scored = assign
      .join(broadcast(probes), Seq("centroid_id"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosMicros("qe", "qn", "e", "nrm").as("cos_micros"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_micros").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_micros"))
  }

  /** Deterministic random-hyperplane components, derived from md5 exactly as
    * the DuckDB oracle derives them (`('0x'||substr(md5(key),1,15))::BIGINT
    * % 2001 - 1000`): integer components in [-1000, 1000], key =
    * "lsh:table:bit:componentIndex" with componentIndex 1-based. O(T*L*dim)
    * driver-side work — never a function of N.
    */
  def lshPlanes(numTables: Int, bitsPerTable: Int, dim: Int): Seq[Seq[Array[Double]]] = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    (0 until numTables).map { t =>
      (0 until bitsPerTable).map { j =>
        (1 to dim)
          .map(i => (java.lang.Long.parseLong(md5hex(s"lsh:$t:$j:$i").substring(0, 15), 16) % 2001L - 1000L).toDouble)
          .toArray
      }
    }
  }

  /** LSH-bucketed ANN — the second scale path next to IVF (random-hyperplane
    * / SimHash-for-cosine LSH: Charikar 2002): each vector gets, per hash
    * table, an L-bit signature whose bit j is sign(dot(e, plane_tj)); only
    * vectors sharing a query's (table, bucket) are ranked.
    *
    * Scale shape:
    *   - plane tables are literal-sized constants (T*L*dim integers);
    *   - signatures are ROW-LOCAL column folds over those literals — zero
    *     shuffle to index N vectors, same property as `ivfAssign`;
    *   - the query signature table (|queries| * T rows) is broadcast into
    *     the signature scan, so candidate selection never shuffles the
    *     N-row side; candidates ≪ N by bucketing (recall tuned by T/L — the
    *     standard multi-table LSH trade);
    *   - the multi-table dedup exchange carries BARE (query_id, vec_id)
    *     pairs (16 bytes/row); vectors re-attach after dedup via broadcast
    *     joins (the candidate-id set is |queries|-bounded, never O(N));
    *   - only the final per-query top-k windows over candidates.
    *
    * Output: (query_id, rank, vec_id, cos_micros).
    */
  def lshTopK(
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      numTables: Int,
      bitsPerTable: Int,
      dim: Int): DataFrame = {
    val v = prepared(emb)
    val planes = lshPlanes(numTables, bitsPerTable, dim)
    // per-table bucket id: sum_j [dot(e, p_tj) > 0] << j — a row-local fold
    val bucketCols: Seq[Column] = planes.zipWithIndex.map { case (tbl, t) =>
      tbl.zipWithIndex
        .map { case (p, j) =>
          val dot = aggregate(zip_with(col("e"), typedLit(p.toSeq), (x, y) => x * y), lit(0.0), (a, x) => a + x)
          when(dot > lit(0.0), lit(1L << j)).otherwise(lit(0L))
        }
        .reduce(_ + _)
        .as(s"b$t")
    }
    // signatures carry ONLY (vec_id, t, bucket) — the multi-table dedup
    // exchange must not ship dim-length vectors T times per candidate pair
    val sigs = v
      .select(col("vec_id") +: bucketCols: _*)
      .select(
        col("vec_id"),
        posexplode(array((0 until numTables).map(t => col(s"b$t")): _*)).as(Seq("t", "bucket")))
    val qb = sigs
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("t"), col("bucket"))
    val cand = sigs
      .join(broadcast(qb), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .dropDuplicates("query_id", "vec_id") // 16-byte rows through the exchange
    // re-attach vectors AFTER dedup: tiny query table broadcast; the
    // candidate-id set is broadcast into the vector scan (no N-side shuffle)
    val q = v.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = v
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        cosMicros("qe", "qn", "e", "nrm").as("cos_micros"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_micros").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_micros"))
  }

  /** IVF-bucketed embedding near-dup (the scale path Dedup.embeddingNearDups
    * points to): assign every vector to a cell row-locally, then compare only
    * WITHIN-cell pairs — the all-pairs N^2 collapses to sum of per-cell n_c^2,
    * and the join shuffles on centroid_id instead of exploding a cross join.
    * Recall is bounded by cell assignment (near-dups straddling a cell
    * boundary are missed — the standard IVF trade; raise numCentroids'
    * granularity or probe neighbors to tighten).
    * Output: (id_a, id_b, cos_micros) with id_a < id_b.
    */
  def ivfNearDups(emb: DataFrame, numCentroids: Int, cosMicrosThreshold: Long): DataFrame = {
    val v = prepared(emb)
    // The self-join's two sides are IDENTICAL subplans, so the nearest-
    // centroid fold (the operator's dominant scan) runs ONCE: the join's own
    // Exchange(centroid_id) on each side is deduplicated by ReuseExchange and
    // both sides read the same shuffle files. The merge hint forces the
    // shuffle join — a broadcast of one side would instead evaluate the fold
    // a second time into the broadcast AND defeat the per-cell co-location.
    // No persist: nothing left in executor storage after the job.
    val assign = ivfAssignPrepared(v, centroids(v, numCentroids)).hint("merge")
    assign.as("a")
      .join(
        assign.as("b"),
        col("a.centroid_id") === col("b.centroid_id") && col("a.vec_id") < col("b.vec_id")
      )
      .select(
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        round(
          aggregate(zip_with(col("a.e"), col("b.e"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
            / (col("a.nrm") * col("b.nrm")) * lit(1e6)
        ).cast("long").as("cos_micros")
      )
      .filter(col("cos_micros") >= cosMicrosThreshold)
  }
}
