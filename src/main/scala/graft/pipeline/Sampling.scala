package graft.pipeline

import org.apache.spark.sql.DataFrame
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
