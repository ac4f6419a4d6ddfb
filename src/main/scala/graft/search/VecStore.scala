package graft.search

import org.apache.spark.sql.SparkSession

/** Pinned in-memory embedding store for the SERVING tier's hybrid vector leg
  * (Phase 11a, /root/reference/COMMERCIAL_ROADMAP.md:86-99) — the serving
  * twin of `graft.pipeline.Similarity.prepared`: float vectors widened to
  * double, precomputed L2 norms, cosine in integer micro-units.
  *
  * Arithmetic parity is the contract: the dot product folds LEFT-TO-RIGHT in
  * element order (exactly Spark's `aggregate(zip_with(a, b, *), 0.0, +)`),
  * and micros round HALF AWAY FROM ZERO (Spark's `round` via BigDecimal
  * HALF_UP on positives/negatives == DuckDB `round`), so the serving leg
  * reproduces the distributed operator's cos_micros bit-for-bit.
  *
  * Scale note: this is the pinned-corpus brute-force leg — O(N·dim) per
  * query, the right shape for a serving node's shard of vectors. A 100 TB
  * deployment fronts this with the IVF/LSH bucketing the batch operators
  * already implement (probe a few cells, brute-force within them); the
  * within-cell kernel IS this scan.
  */
final class VecStore private (
    private val ids: Array[Long],
    private val vecs: Array[Array[Double]],
    private val norms: Array[Double]) {

  def size: Int = ids.length

  private def cosMicros(qi: Int, i: Int): Long = {
    val a = vecs(qi)
    val b = vecs(i)
    var dot = 0.0
    var j = 0
    while (j < a.length) { dot += a(j) * b(j); j += 1 }
    VecStore.roundHalfAwayMicros(dot / (norms(qi) * norms(i)))
  }

  /** Top-n neighbors of the stored vector `queryVecId` (self excluded), as
    * 1-based (vec_id, rank) by (cos_micros desc, vec_id asc) — the exact
    * ordering contract of `Similarity.bruteForceTopK`.
    */
  def topK(queryVecId: Long, n: Int): Seq[(Long, Long)] = {
    val qi = java.util.Arrays.binarySearch(ids, queryVecId)
    if (qi < 0) return Nil
    val scored = new Array[(Long, Long)](ids.length - 1) // (cos, id)
    var w = 0
    var i = 0
    while (i < ids.length) {
      if (i != qi) { scored(w) = (cosMicros(qi, i), ids(i)); w += 1 }
      i += 1
    }
    scala.util.Sorting.stableSort(scored,
      (x: (Long, Long), y: (Long, Long)) => x._1 > y._1 || (x._1 == y._1 && x._2 < y._2))
    scored.iterator.take(n).zipWithIndex.map { case ((_, id), r) => (id, r + 1L) }.toSeq
  }

  // cell member indices per numCentroids config, built once per store
  private val ivfCells = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Int]]]()

  private def cellsFor(numCentroids: Int): Array[Array[Int]] =
    ivfCells.computeIfAbsent(numCentroids, nc0 => {
      val nc = math.min(nc0, ids.length)
      // centroids = the first nc vectors by vec_id (the store is sorted),
      // exactly Similarity.centroids; each vector assigns to its nearest
      // centroid by (cos_micros desc, centroid_id asc) — ids are sorted, so
      // centroid-index order IS centroid-id order
      val buf = Array.fill(nc)(new scala.collection.mutable.ArrayBuffer[Int]())
      var i = 0
      while (i < ids.length) {
        var best = -1
        var bestCm = Long.MinValue
        var c = 0
        while (c < nc) {
          val cm = cosMicros(i, c)
          if (cm > bestCm) { bestCm = cm; best = c } // ties keep the lower cid
          c += 1
        }
        buf(best) += i
        i += 1
      }
      buf.map(_.toArray)
    })

  /** Serving-tier IVF ANN over the pinned store — the same semantics and
    * integer arithmetic as `Similarity.ivfTopK` (and the `q_ann_ivf`
    * oracle): centroids are the first `numCentroids` vectors by vec_id,
    * every vector assigns to its nearest centroid (cos_micros desc,
    * centroid_id asc), a query probes its `nprobe` best centroids and
    * brute-forces ONLY their members — the within-cell kernel is the same
    * pinned scan the hybrid leg uses, so per-query cost is
    * O(numCentroids + probed members), not O(N). Cell lists build lazily
    * once per (store, numCentroids) and are shared across requests.
    * Output: (rank, vec_id, cos_micros), rank 1-based, self excluded.
    */
  def ivfTopK(queryVecId: Long, n: Int, numCentroids: Int, nprobe: Int): Seq[(Long, Long, Long)] = {
    val qi = java.util.Arrays.binarySearch(ids, queryVecId)
    if (qi < 0) return Nil
    val cells = cellsFor(numCentroids)
    val nc = cells.length
    // probe order: (cos_micros desc, centroid_id asc); centroid index order
    // is id order, so a stable sort on descending cm preserves the tie rule
    val probeOrder = (0 until nc).map(c => (cosMicros(qi, c), c)).toArray
    scala.util.Sorting.stableSort(probeOrder,
      (x: (Long, Int), y: (Long, Int)) => x._1 > y._1 || (x._1 == y._1 && x._2 < y._2))
    val scored = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (cos, id)
    probeOrder.iterator.take(math.min(nprobe, nc)).foreach { case (_, c) =>
      cells(c).foreach { i =>
        if (i != qi) scored += ((cosMicros(qi, i), ids(i)))
      }
    }
    val arr = scored.toArray
    scala.util.Sorting.stableSort(arr,
      (x: (Long, Long), y: (Long, Long)) => x._1 > y._1 || (x._1 == y._1 && x._2 < y._2))
    arr.iterator.take(n).zipWithIndex.map { case ((cm, id), r) => (r + 1L, id, cm) }.toSeq
  }

  // per-(numTables, bitsPerTable) LSH structures: each vector's per-table
  // bucket, and (table, bucket) -> member indices
  private val lshIndexes = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int), (Array[Array[Long]], java.util.HashMap[java.lang.Long, Array[Int]])]()

  private def lshIndexFor(numTables: Int, bitsPerTable: Int) = {
    // key packing is (table << bits) | bucket — exact only while the shifted
    // table index cannot collide with bucket bits
    require(bitsPerTable >= 1 && bitsPerTable <= 56 && numTables >= 1 && numTables <= 64,
      s"bitsPerTable must be in [1,56] and numTables in [1,64] (got $bitsPerTable, $numTables)")
    lshIndexes.computeIfAbsent((numTables, bitsPerTable), { case (nt, bits) =>
      val dim = if (vecs.isEmpty) 0 else vecs(0).length
      val planes = graft.pipeline.Similarity.lshPlanes(nt, bits, dim)
      val perVec = Array.ofDim[Long](ids.length, nt)
      val acc = new java.util.HashMap[java.lang.Long, scala.collection.mutable.ArrayBuffer[Int]]()
      var i = 0
      while (i < ids.length) {
        val e = vecs(i)
        var t = 0
        while (t < nt) {
          var bucket = 0L
          var j = 0
          while (j < bits) {
            val p = planes(t)(j)
            var dot = 0.0
            var d = 0
            while (d < e.length) { dot += e(d) * p(d); d += 1 }
            if (dot > 0.0) bucket |= (1L << j)
            j += 1
          }
          perVec(i)(t) = bucket
          val key = java.lang.Long.valueOf((t.toLong << bits) | bucket)
          var buf = acc.get(key)
          if (buf == null) { buf = new scala.collection.mutable.ArrayBuffer[Int](4); acc.put(key, buf) }
          buf += i
          t += 1
        }
        i += 1
      }
      val frozen = new java.util.HashMap[java.lang.Long, Array[Int]](acc.size() * 2)
      acc.forEach((k, v) => frozen.put(k, v.toArray))
      (perVec, frozen)
    })
  }

  /** Serving-tier random-hyperplane LSH ANN — the pinned twin of
    * `Similarity.lshTopK` (same md5-derived integer planes via
    * `Similarity.lshPlanes`, same left-to-right dot folds, same
    * bucket rule): candidates are the query's bucket mates in ANY table
    * (deduplicated), brute-forced exactly — per-request cost
    * O(tables x bits x dim + bucket mates), never O(N). Structures build
    * lazily once per (store, numTables, bitsPerTable).
    * Output: (rank, vec_id, cos_micros), rank 1-based, self excluded.
    */
  def lshTopK(queryVecId: Long, n: Int, numTables: Int, bitsPerTable: Int): Seq[(Long, Long, Long)] = {
    val qi = java.util.Arrays.binarySearch(ids, queryVecId)
    if (qi < 0) return Nil
    val (perVec, index) = lshIndexFor(numTables, bitsPerTable)
    val seen = new java.util.HashSet[Integer]()
    val scored = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var t = 0
    while (t < numTables) {
      val mates = index.get(java.lang.Long.valueOf((t.toLong << bitsPerTable) | perVec(qi)(t)))
      if (mates != null) mates.foreach { i =>
        if (i != qi && seen.add(i)) scored += ((cosMicros(qi, i), ids(i)))
      }
      t += 1
    }
    val arr = scored.toArray
    scala.util.Sorting.stableSort(arr,
      (x: (Long, Long), y: (Long, Long)) => x._1 > y._1 || (x._1 == y._1 && x._2 < y._2))
    arr.iterator.take(n).zipWithIndex.map { case ((cm, id), r) => (r + 1L, id, cm) }.toSeq
  }
}

object VecStore {

  /** Round to integer micros, half away from zero — the semantics shared by
    * Spark `round` (BigDecimal HALF_UP) and DuckDB `round` on doubles.
    * (`math.round` alone rounds half UP — wrong for negative cosines.)
    */
  def roundHalfAwayMicros(x: Double): Long = {
    val scaled = x * 1e6
    if (scaled >= 0) math.floor(scaled + 0.5).toLong else -math.floor(-scaled + 0.5).toLong
  }

  /** Load an embeddings parquet (vec_id long, embedding array<float>) into a
    * pinned store, sorted by vec_id. Driver/serving-node memory is
    * O(N·dim) — the serving shard's working set, by design (see class note).
    */
  def load(spark: SparkSession, path: String): VecStore = {
    val rows = spark.read.parquet(path)
      .select("vec_id", "embedding")
      .collect()
      .map { r =>
        val id = r.getLong(0)
        val fs = r.getSeq[Float](1)
        val v = new Array[Double](fs.length)
        var i = 0
        while (i < fs.length) { v(i) = fs(i).toDouble; i += 1 }
        (id, v)
      }
      .sortBy(_._1)
    val ids = rows.map(_._1)
    val vecs = rows.map(_._2)
    val norms = vecs.map { v =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    new VecStore(ids, vecs, norms)
  }
}
