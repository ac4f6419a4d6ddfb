package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language-ID heuristic,
  * quality scoring, token counting, document fingerprinting. All column
  * expressions (codegen'd, no UDF in the hot path except the reference
  * tokenizer where exact token parity is required).
  */
object TextStats {

  /** Per-language stopword lists for the n-gram/stopword language heuristic. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "en" -> Seq("the", "of", "and", "to", "in", "is", "on", "for"),
    "es" -> Seq("el", "la", "de", "que", "los", "es", "una", "por"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "une", "dans")
  )

  import graft.index.IndexBuilder.tokenizeUdf

  /** Language ID: tf-weighted stopword hits per language; winner by
    * (hits DESC, lang ASC); zero hits everywhere -> 'und'.
    * Output: (doc_id, lang_pred, hits).
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokenizeUdf(col("text"))).as("term"))
    val perLang = StopwordSets.map { case (lang, words) =>
      toks
        .groupBy(col("doc_id"))
        .agg(sum(when(col("term").isin(words: _*), 1L).otherwise(0L)).as("hits"))
        .select(col("doc_id"), lit(lang).as("lang"), col("hits"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("lang").asc)
    perLang
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        when(col("hits") > 0, col("lang")).otherwise(lit("und")).as("lang_pred"),
        col("hits")
      )
  }

  /** Quality metrics + composite score (micro-units):
    * quality = 0.4*min(1, n_tokens/100) + 0.3*(1 - punct_ratio) + 0.3*stop_ratio.
    * Output: (doc_id, n_chars_calc, ws_tokens, n_tokens, punct_chars,
    *          stop_hits, quality_micros).
    */
  def quality(docs: DataFrame): DataFrame = {
    val enStops = StopwordSets.toMap.apply("en")
    val base = docs.select(
      col("doc_id"),
      col("text"),
      length(col("text")).cast("long").as("n_chars_calc"),
      size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("long").as("ws_tokens"),
      tokenizeUdf(col("text")).as("toks"),
      length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).cast("long").as("punct_chars")
    )
    base
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn(
        "stop_hits",
        size(filter(col("toks"), t => t.isin(enStops: _*))).cast("long")
      )
      .withColumn(
        "quality_micros",
        round(
          (lit(0.4) * least(lit(1.0), col("n_tokens") / lit(100.0))
            + lit(0.3) * (lit(1.0) - col("punct_chars") / greatest(col("n_chars_calc"), lit(1L)))
            + lit(0.3) * (col("stop_hits") / greatest(col("n_tokens"), lit(1L)))) * lit(1e6)
        ).cast("long")
      )
      .select(
        col("doc_id"), col("n_chars_calc"), col("ws_tokens"), col("n_tokens"),
        col("punct_chars"), col("stop_hits"), col("quality_micros")
      )
  }

  /** Document fingerprint: bottom-4 sketch over md5 hashes of w-token
    * shingles (a winnowing-style content signature that survives small
    * edits). Output: (doc_id, fp).
    */
  def fingerprint(docs: DataFrame, w: Int = 5): DataFrame =
    Dedup
      .shingles(docs, w)
      .select(col("doc_id"), md5(col("sh")).as("h"))
      .groupBy(col("doc_id"))
      .agg(array_join(slice(array_sort(collect_set(col("h"))), 1, 4), ",").as("fp"))
}
