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

  /** Repetition signals — the Gopher-style repetition quality filters
    * (Rae et al. 2021 §A1.1: documents dominated by a few repeated n-grams
    * are low-quality): share of the single most frequent token bigram and
    * the distinct-token ratio, in integer micro-units (floor division —
    * matches DuckDB `//` bit-exactly). ROW-LOCAL, ZERO shuffle: no bigram
    * explosion, no groupBy. The bigram mode uses a small Scala UDF (O(n)
    * open hash count per row) — the only O(n) formulation; the pure
    * higher-order-function form (`array_max(transform(array_distinct(bg),
    * x -> size(filter(bg, _ = x))))`) is O(n²) per row, which a 10k-token
    * document turns into 10^8 comparisons. Output: (doc_id, n_bigrams,
    * top_bigram_micros, distinct_ratio_micros).
    */
  def repetition(docs: DataFrame): DataFrame = {
    val topBigram = udf { toks: Seq[String] =>
      val n = toks.length
      if (n < 2) 0L
      else {
        val m = new scala.collection.mutable.HashMap[String, Int]()
        var i = 0
        var max = 0
        while (i < n - 1) {
          val c = m.updateWith(toks(i) + " " + toks(i + 1))(v => Some(v.getOrElse(0) + 1)).get
          if (c > max) max = c
          i += 1
        }
        max * 1000000L / (n - 1)
      }
    }
    docs
      .select(col("doc_id"), tok(docs)(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .select(
        col("doc_id"),
        greatest(col("n_toks") - lit(1L), lit(0L)).as("n_bigrams"),
        topBigram(col("toks")).as("top_bigram_micros"),
        expr(
          "CASE WHEN n_toks > 0 THEN CAST((n_distinct * 1000000) DIV n_toks AS BIGINT) " +
            "ELSE CAST(0 AS BIGINT) END").as("distinct_ratio_micros"))
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
    // N (total docs, INCLUDING zero-token docs) rides the df aggregation as a
    // sentinel term emitted once per doc — "\u0000" can never collide with a
    // real term (the tokenizer emits only [a-z0-9]+). This removes the
    // dedicated docs.count() job the old version paid: one wasted corpus
    // pass per invocation at 100 TB.
    val Sentinel = "\u0000"
    val tfPlus = docs
      .select(
        col("doc_id"),
        explode(
          map_concat(
            coalesce(call_function("ref_tokenize_tf", col("text")).getField("tfmap"),
              map().cast("map<string,int>")),
            map(lit(Sentinel), lit(1))))
          .as(Seq("term", "tf")))
    val tf = tfPlus.filter(col("term") =!= Sentinel)
    // one grouped aggregation yields BOTH per-term df and (as the sentinel
    // group) N; the two consumers sit above the same exchange (ReuseExchange)
    val grouped = tfPlus.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dfTab = grouped.filter(col("term") =!= Sentinel)
    val nTab = grouped.filter(col("term") === Sentinel)
      .select(col("df").cast("double").as("__n"))
    val scored = tf
      .join(dfTab, Seq("term"))
      .crossJoin(broadcast(nTab))
      .withColumn(
        "score_micros",
        round(col("tf") * log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * lit(1e6))
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_micros").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("score_micros"))
  }

  /** Corpus-conditional character-bigram familiarity — the statistical
    * "does this read like the corpus" fluency signal (the CCNet/DataComp
    * LM-perplexity role, without an external LM): per doc, the mean
    * conditional bigram probability under the corpus's own bigram model,
    * in EXACT INTEGER MICROS — per bigram (a,b):
    * micros = count(a,b) * 1e6 DIV count(a, *); familiarity = mean over the
    * doc's bigrams (integer DIV). Integer end-to-end, so the DuckDB oracle
    * is bit-exact — no float-log rounding hazards. Gibberish and
    * wrong-alphabet text score low; corpus-typical text scores high.
    *
    * Alphabet: ASCII codepoints 0-127 plus one OTHER bucket (UTF-16 units
    * >= 128 — matches the oracle for any BMP text; this corpus is ASCII).
    *
    * Scale shape: the model pass is mapPartitions with a dense local count
    * array — ONE (code, count) row per distinct bigram per partition
    * leaves each task (<= 129^2 rows, the classic partial-aggregate
    * shape), one tiny groupBy, and the <= 17k-entry model broadcasts. The
    * scoring pass is row-local with zero shuffle. Per-bigram division
    * falls back to BigInt only when count * 1e6 would overflow a long
    * (corpus beyond ~9.2e12 occurrences of one leading char).
    */
  def bigramFamiliarity(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val A = 129
    @inline def codeOf(s: String, i: Int): Int = { val c = s.charAt(i).toInt; if (c < 128) c else 128 }

    val texts = docs.select(col(idCol).cast("long").as("doc_id"),
      coalesce(col(textCol), lit("")).as("text"))
    val counts = texts
      .select(col("text")).as[String]
      .mapPartitions { it =>
        val arr = new Array[Long](A * A)
        it.foreach { s =>
          var i = 0
          while (i + 1 < s.length) { arr(codeOf(s, i) * A + codeOf(s, i + 1)) += 1; i += 1 }
        }
        arr.iterator.zipWithIndex.collect { case (c, k) if c > 0 => (k, c) }
      }
      .toDF("k", "c")
      .groupBy(col("k")).agg(sum(col("c")).as("c"))
      .collect()
    val cab = new Array[Long](A * A)
    counts.foreach(r => cab(r.getInt(0)) = r.getLong(1))
    val ca = new Array[Long](A)
    var k = 0
    while (k < A * A) { ca(k / A) += cab(k); k += 1 }
    val bc = spark.sparkContext.broadcast((cab, ca))

    texts.as[(Long, String)]
      .mapPartitions { it =>
        val (ab, a) = bc.value
        @inline def micros(num: Long, den: Long): Long =
          if (num < Long.MaxValue / 1000000L) num * 1000000L / den
          else (BigInt(num) * 1000000 / den).toLong
        it.flatMap { case (id, s) =>
          if (s.length < 2) None
          else {
            var i = 0
            var n = 0L
            var sum = 0L
            while (i + 1 < s.length) {
              val ai = codeOf(s, i)
              sum += micros(ab(ai * A + codeOf(s, i + 1)), a(ai))
              n += 1
              i += 1
            }
            Some((id, n, sum / n))
          }
        }
      }
      .toDF("doc_id", "n_bigrams", "familiarity_micros")
  }
}
