package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: IVF — vectors are
  * bucketed to their nearest centroid once at index time; a query probes only
  * the `nprobe` closest cells, turning the O(N) scan into O(N * nprobe / C).
  * Centroids here are a deterministic subset of the vectors (id % `centroidMod`
  * == 0) so the oracle can replicate cell assignment exactly; on a real
  * deployment they'd come from k-means, which changes only how the centroid
  * table is produced, not the plan shape.
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

  /** IVF cell assignment: every vector to its best centroid by
    * (cos_micros DESC, centroid_id ASC). Output: (vec_id, centroid_id).
    */
  def ivfAssign(emb: DataFrame, centroidMod: Long): DataFrame = {
    val v = prepared(emb)
    val cents = v.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("centroid_id"), col("e").as("ce"), col("nrm").as("cn"))
    val scored = v
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"), cosMicros("e", "nrm", "ce", "cn").as("cm"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cm").desc, col("centroid_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
  }

  /** IVF-probed ANN: probe the `nprobe` best cells for each query, rank only
    * their member vectors. Output: (query_id, rank, vec_id, cos_micros).
    */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, centroidMod: Long, nprobe: Int): DataFrame = {
    val v = prepared(emb).persist()
    val cents = v.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("centroid_id"), col("e").as("ce"), col("nrm").as("cn"))

    val assign = {
      val scored = v
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"), cosMicros("e", "nrm", "ce", "cn").as("cm"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cm").desc, col("centroid_id").asc)
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("centroid_id"))
    }

    val q = v.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))

    val probes = {
      val scored = q
        .crossJoin(broadcast(cents))
        .select(col("query_id"), col("centroid_id"), cosMicros("qe", "qn", "ce", "cn").as("cm"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cm").desc, col("centroid_id").asc)
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= nprobe)
        .select(col("query_id"), col("centroid_id"))
    }

    val members = probes.join(assign, Seq("centroid_id")).select(col("query_id"), col("vec_id"))
    val scored = members
      .join(q, Seq("query_id"))
      .join(v, Seq("vec_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosMicros("qe", "qn", "e", "nrm").as("cos_micros"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_micros").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_micros"))
  }
}
