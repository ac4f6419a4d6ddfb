package graft.pipeline

import org.apache.spark.sql.DataFrame
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

  /** Reference tokenizer as a codegen-resident native Column (no Scala UDF
    * in corpus-scan hot paths).
    */
  private def tok(df: DataFrame) =
    graft.index.IndexBuilder.tokenizerCol(df.sparkSession, codeAware = false)

  /** Language ID: tf-weighted stopword hits per language; winner by
    * (hits DESC, lang ASC); zero hits everywhere -> 'und'.
    * Output: (doc_id, lang_pred, hits).
    *
    * ONE pass, ZERO shuffle: every per-language hit count is a row-local
    * `size(filter(tokens, ...))` over the single tokenize result, and the
    * winner is a greatest + first-match projection — no per-language corpus
    * rescans, no groupBy, no window.
    */
  def langId(docs: DataFrame): DataFrame = {
    val langs = StopwordSets.map(_._1) // already lang-ASC
    val withHits = docs.select(
      col("doc_id") +: StopwordSets.map { case (lang, words) =>
        size(filter(tok(docs)(col("text")), t => t.isin(words: _*))).cast("long").as(s"hits_$lang")
      }: _*
    )
    val maxHits = greatest(langs.map(l => col(s"hits_$l")): _*)
    // first language (ASC) whose hits equal the max — the oracle's
    // row_number(ORDER BY hits DESC, lang ASC) winner
    val winner = langs.foldRight(lit("und")) { (l, rest) =>
      when(col(s"hits_$l") === col("hits"), lit(l)).otherwise(rest)
    }
    withHits
      .withColumn("hits", maxHits)
      .select(
        col("doc_id"),
        when(col("hits") > 0, winner).otherwise(lit("und")).as("lang_pred"),
        col("hits")
      )
  }

  /** Quality metrics + composite score (micro-units):
    * quality = 0.4*min(1, n_tokens/100) + 0.3*(1 - punct_ratio) + 0.3*stop_ratio.
    * `bpe_tokens_est` is the BPE-ish subword count: ceil(len/4) per reference
    * token (the classic ~4-chars-per-token budget rule) — deterministic and
    * reproducible in ANSI SQL, unlike a real learned merges table.
    * Output: (doc_id, n_chars_calc, ws_tokens, n_tokens, bpe_tokens_est,
    *          punct_chars, stop_hits, quality_micros).
    */
  def quality(docs: DataFrame): DataFrame = {
    val enStops = StopwordSets.toMap.apply("en")
    val base = docs.select(
      col("doc_id"),
      col("text"),
      length(col("text")).cast("long").as("n_chars_calc"),
      size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("long").as("ws_tokens"),
      tok(docs)(col("text")).as("toks"),
      length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).cast("long").as("punct_chars")
    )
    base
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn(
        "bpe_tokens_est",
        aggregate(col("toks"), lit(0L), (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
      )
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
        col("bpe_tokens_est"), col("punct_chars"), col("stop_hits"), col("quality_micros")
      )
  }

  /** Document fingerprint: bottom-4 sketch over md5 hashes of w-token
    * shingles (a winnowing-style content signature that survives small
    * edits). ROW-LOCAL via the native shingle expression — zero shuffle,
    * no shingle explosion; docs with fewer than w tokens are dropped
    * (matching the exploded form's domain). Output: (doc_id, fp).
    */
  def fingerprint(docs: DataFrame, w: Int = 5): DataFrame = {
    graft.expr.ShingleExprs.register(docs.sparkSession)
    docs
      .select(col("doc_id"), tok(docs)(col("text")).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), call_function("shingle_fp", col("toks"), lit(w), lit(4)).as("fp"))
  }

  /** Top-k keywords per document by tf-idf (idf = the engine's BM25 idf,
    * ln((N - df + 0.5) / (df + 0.5) + 1)), rank ordered on the ROUNDED
    * micro-unit score (score desc, term asc) so the order is bit-stable
    * across engines. One row-local tokenize (fused tfmap — no
    * groupBy(doc, term) exchange); df is one vocab-sized aggregation; the
    * per-doc window partitions by doc_id (no global window). Zero-token
    * docs contribute no rows. Output: (doc_id, rank, term, score_micros).
    */
  def keywords(docs: DataFrame, k: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    graft.expr.RefTokenizeTf.register(spark)
    val n = docs.count().toDouble
    val tf = docs
      .select(
        col("doc_id"),
        explode(call_function("ref_tokenize_tf", col("text")).getField("tfmap")).as(Seq("term", "tf")))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(dfTab, Seq("term"))
      .withColumn(
        "score_micros",
        round(col("tf") * log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * lit(1e6))
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_micros").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("score_micros"))
  }
}
