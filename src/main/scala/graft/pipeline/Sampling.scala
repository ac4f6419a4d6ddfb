package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mix operators: deterministic sampling and corpus-mix
  * accounting — the curation steps that sit between dedup/quality filtering
  * and tokenizer-ready shards in a 100 TB pipeline.
  */
object Sampling {

  /** Deterministic hash sampling: keep a row iff the 60-bit hex prefix of
    * md5(salt ":" id) mod 1e6 < rateMicros. No RNG, no `sample()` — the
    * decision is a pure function of (salt, id), so splits are reproducible
    * across engines, runs, partitionings, and incremental corpus growth
    * (a doc never migrates between train/eval when new docs arrive). Salt
    * names the split; disjoint splits use disjoint rate windows on one salt.
    */
  def sampleDeterministic(
      docs: DataFrame,
      rateMicros: Long,
      salt: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    val h = conv(
      substring(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), 1, 15), 16, 10
    ).cast("long")
    docs.filter(pmod(h, lit(1000000L)) < lit(rateMicros))
  }

  /** Sequence/shard packing for training: assign each doc (in deterministic
    * doc_id order) to the shard its EXCLUSIVE running token total lands in —
    * shard_id = prefixTokens DIV budget. Greedy sequential packing, the shape
    * tokenizer-ready shard writers consume.
    *
    * Scale shape: a naive `sum() OVER (ORDER BY doc_id)` is a single-task
    * global window — anti-scale. This is the two-pass prefix sum instead
    * (the DocIdAssigner pattern): range-exchange on doc_id, per-partition
    * token totals collected to the driver (one long per partition) by pass 1,
    * then pass 2 adds the exclusive partition offset to a within-partition
    * running sum. Both passes run over the SAME RDD object, so the range
    * exchange is shuffled once and pass 2 reads the shuffle files — no
    * persist(), nothing left in executor storage after the job. (The
    * mapPartitionsWithIndex index is the PARENT split index, carried in the
    * partition object itself — unlike TaskContext.getPartitionId it is
    * stable under downstream coalesce fusion.)
    * Output: (doc_id, n_tokens, shard_id).
    */
  def packShards(docs: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "shard token budget must be positive")
    val spark = docs.sparkSession
    graft.expr.RefTokenizeTf.register(spark)
    val parts = docs
      .select(
        col("doc_id"),
        call_function("ref_tokenize_tf", col("text")).getField("dl").cast("long").as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .select(col("doc_id").cast("long"), col("n_tokens"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .rdd

    // pass 1: one long per partition
    val partTotals = parts
      .mapPartitions(it => Iterator.single(it.foldLeft(0L)(_ + _._2)))
      .collect()
    val offsets = partTotals.scanLeft(0L)(_ + _) // exclusive prefix per partition

    // pass 2: within-partition running sum + broadcast offset (reuses the
    // pass-1 shuffle; the in-partition sort re-runs, which is the same cost
    // the old window-function pass paid)
    val offsetsBc = spark.sparkContext.broadcast(offsets)
    val packed = parts.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsetsBc.value(pid)
      it.map { case (docId, nTok) =>
        val shard = acc / budgetTokens // exclusive prefix -> floor div
        acc += nTok
        (docId, nTok, shard)
      }
    }
    import spark.implicits._
    packed.toDF("doc_id", "n_tokens", "shard_id")
  }

  /** Deterministic mix rebalancing: cap every language at `capMicros` of the
    * corpus DOC count by downsampling overweight languages with the same
    * salted-hash rule as [[sampleDeterministic]] — so the kept set is a pure
    * function of (salt, doc_id) and stays STABLE as the corpus grows.
    * rate_lang = min(1e6, capMicros * total / n_lang), computed in INTEGER
    * micro-units (floor division) so any engine reproduces the exact rows.
    *
    * Scale shape: one tiny per-lang count aggregation (|langs| rows,
    * collected and re-broadcast as a literal rate table), then a row-local
    * hash filter behind a broadcast join — the corpus is never shuffled.
    * Output: (doc_id, lang) of the surviving docs.
    */
  def rebalance(docs: DataFrame, capMicros: Long, salt: String): DataFrame = {
    require(capMicros > 0 && capMicros <= 1000000L, "cap must be in (0, 1e6] micro-units")
    val spark = docs.sparkSession
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
    val total = counts.map(_.getLong(1)).sum
    val rates = counts.map { r =>
      val n = r.getLong(1)
      (r.getString(0), math.min(1000000L, capMicros * total / n)) // integer floor div
    }
    import spark.implicits._
    val rateDf = rates.toSeq.toDF("lang", "rate_micros")
    val h = conv(
      substring(md5(concat(lit(salt), lit(":"), col("doc_id").cast("string"))), 1, 15), 16, 10
    ).cast("long")
    docs
      .join(broadcast(rateDf), Seq("lang"))
      .filter(pmod(h, lit(1000000L)) < col("rate_micros"))
      .select(col("doc_id"), col("lang"))
  }

  /** Corpus mix accounting: documents and reference-token counts per
    * (lang, source) with each cell's token share in micro-units. One
    * tokenize pass, one small aggregation; the total joins back via a
    * broadcast of the 1-row aggregate (no global window).
    * Output: (lang, source, n_docs, tokens, share_micros).
    */
  def mix(docs: DataFrame): DataFrame = {
    val tok = graft.index.IndexBuilder.tokenizerCol(docs.sparkSession, codeAware = false)
    val g = docs
      .select(col("lang"), col("source"), size(tok(col("text"))).cast("long").as("dl"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tokens"))
    val total = g.agg(sum(col("tokens")).as("total_tokens"))
    g.crossJoin(broadcast(total))
      .select(
        col("lang"),
        col("source"),
        col("n_docs"),
        col("tokens"),
        round(col("tokens") * lit(1e6) / col("total_tokens")).cast("long").as("share_micros")
      )
  }
}
