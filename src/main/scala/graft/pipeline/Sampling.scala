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
    * token totals prefix-summed on the driver (one long per partition), then
    * a WITHIN-partition running sum plus the broadcast partition offset.
    * The partition id is frozen as a data column (coalesce-fusion safe).
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
      .withColumn("__pid", spark_partition_id())
      .persist()
    parts.count() // freeze __pid before dependent jobs

    val sums = parts
      .groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, t) => val row = (pid, acc); acc += t; row }
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("__pid", "__toff")

    val w = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("__pre", col("__toff") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard_id", expr(s"__pre DIV ${budgetTokens}L")) // exact integer division both engines
      .select(col("doc_id"), col("n_tokens"), col("shard_id"))
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
