package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.index.{DocIdAssigner, IndexBuilder}
import graft.search.SearchEngine

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql` twin) per
  * implemented operator from SURVEY.md §2 and the pipeline extensions.
  *
  * Column-name discipline: every aggregate/computed column is aliased to the
  * SAME lowercase name on both sides. Floating-point outputs are emitted as
  * integer micro-units (`CAST(round(x * 1e6) AS BIGINT)`) on both sides, so
  * cross-engine float summation-order noise (~1e-12) and decimal-formatting
  * differences cannot flip the hash compare.
  */
object SparkEntry {

  // ---------------------------------------------------------------- caching
  private val engineCache = scala.collection.concurrent.TrieMap[String, SearchEngine]()

  private def engine(spark: SparkSession, dir: String): SearchEngine =
    engineCache.getOrElseUpdate(
      spark.sparkContext.applicationId + "|" + dir, {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        new SearchEngine(IndexBuilder.build(docs).cache())
      }
    )

  private def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** double -> integer micro-units, the cross-engine-stable score encoding. */
  private def micros(c: org.apache.spark.sql.Column) =
    round(c * lit(1e6)).cast("long")

  // ------------------------------------------------------------ oracle CTEs
  /** Shared DuckDB CTE prefix: reference tokenization + doc lengths + corpus
    * stats over the `documents` table. ASCII corpus => the regex split is
    * byte-identical to the engine's byte-wise tokenizer.
    */
  private val tokCte =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term FROM documents
      |), tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      |dls AS (
      |  SELECT d.doc_id, count(t.term) AS dl
      |  FROM documents d LEFT JOIN tok2 t ON d.doc_id = t.doc_id GROUP BY d.doc_id
      |),
      |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dls)""".stripMargin

  private def inList(terms: Seq[String]): String =
    terms.distinct.map(t => s"'$t'").mkString("(", ",", ")")

  /** BM25 `scores(doc_id, score)` CTE chain for a query with term
    * multiplicities `terms: (term, weight)` (duplicate query terms score once
    * per occurrence — weight = occurrence count), AND/OR candidates,
    * k1=1.2, b=0.75, idf = ln((n-df+0.5)/(df+0.5)+1).
    */
  private def scoresCte(terms: Seq[(String, Int)], isOr: Boolean): String = {
    val lst = inList(terms.map(_._1))
    val weightCase = terms
      .map { case (t, w) => s"WHEN p.term = '$t' THEN $w.0" }
      .mkString("CASE ", " ", " END")
    val candidate =
      if (isOr) "SELECT DISTINCT doc_id FROM posts"
      else s"SELECT doc_id FROM posts GROUP BY doc_id HAVING count(DISTINCT term) = ${terms.size}"
    s"""posts AS (SELECT term, doc_id, count(*) AS tf FROM tok2 WHERE term IN $lst GROUP BY term, doc_id),
       |dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok2 WHERE term IN $lst GROUP BY term),
       |cand AS ($candidate),
       |parts AS (
       |  SELECT p.doc_id,
       |         ($weightCase) *
       |         ln((s.n - f.df + 0.5)/(f.df + 0.5) + 1.0)
       |           * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS part
       |  FROM posts p JOIN dfs f USING (term) JOIN dls d ON p.doc_id = d.doc_id
       |  JOIN cand c ON p.doc_id = c.doc_id CROSS JOIN stats s
       |),
       |scores AS (SELECT doc_id, sum(part) AS score FROM parts GROUP BY doc_id),
       |ranked AS (
       |  SELECT row_number() OVER (ORDER BY CAST(round(score * 1e6) AS BIGINT) DESC, doc_id ASC) AS rank,
       |         doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_r
       |  FROM scores
       |)""".stripMargin
  }

  private def bm25Sql(terms: Seq[(String, Int)], isOr: Boolean, k: Int): String =
    s"""$tokCte,
       |${scoresCte(terms, isOr)}
       |SELECT rank, doc_id, score_r FROM ranked WHERE rank <= $k""".stripMargin

  /** Spark twin of bm25Sql's ranking projection over the REAL engine plan. */
  private def bm25TopK(spark: SparkSession, dir: String, query: String, k: Int): DataFrame = {
    val scored = engine(spark, dir).scoredDF(query)
    val w = Window.orderBy(col("score_r").desc, col("doc_id").asc)
    scored
      .select(col("doc_id"), micros(col("score")).as("score_r"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("score_r"))
  }

  // ---------------------------------------------------------------- queries

  /** Flagship query on sf=0.001: BM25 top-10 through the whole engine. */
  def entry(spark: SparkSession): DataFrame =
    bm25TopK(spark, "/root/testdata/sf0.001", "table scan merge", 10)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- A1: TF aggregation (tokenize + explode + hash agg) ---
    "q_postings" -> ((s, dir) => {
      engine(s, dir).index.postings
        .select(col("term"), col("doc_id"), col("tf").cast("long").as("tf"), col("dl").cast("long").as("dl"))
    }),
    // --- A3: document length ---
    "q_doclen" -> ((s, dir) => {
      engine(s, dir).index.docstore
        .select(col("doc_id"), col("dl").cast("long").as("dl"))
    }),
    // --- A4: corpus stats ---
    "q_stats" -> ((s, dir) => {
      engine(s, dir).index.docstore
        .agg(count(lit(1)).as("n"), micros(avg(col("dl"))).as("avgdl_micros"))
    }),
    // --- A2: per-term document frequency ---
    "q_df" -> ((s, dir) => {
      engine(s, dir).index.dfTable.select(col("term"), col("df"))
    }),
    // --- J2: AND candidate selection (count-matching intersection) ---
    "q_search_and" -> ((s, dir) => {
      engine(s, dir).scoredDF("data table join").select(col("doc_id"))
    }),
    // --- J3: OR candidate selection (union) ---
    "q_search_or" -> ((s, dir) => {
      engine(s, dir).scoredDF("spark OR stream vector").select(col("doc_id"))
    }),
    // --- J4: NOT exclusion (anti join) ---
    "q_search_not" -> ((s, dir) => {
      engine(s, dir).scoredDF("join row -filter").select(col("doc_id"))
    }),
    // --- A5+O1+O2: full BM25 ranked top-k, AND mode ---
    "q_bm25_topk" -> ((s, dir) => bm25TopK(s, dir, "table scan merge", 20)),
    // --- A5 OR mode ---
    "q_bm25_or_topk" -> ((s, dir) => bm25TopK(s, dir, "spark OR stream vector", 20)),
    // --- A5: duplicate query terms score per occurrence ---
    "q_bm25_dup_topk" -> ((s, dir) => bm25TopK(s, dir, "the the fast", 15)),
    // --- F2: snippets on the ranked top-k ---
    "q_snippets" -> ((s, dir) => {
      val snippetUdf = udf((text: String) =>
        graft.core.Snippets.makeSnippet(text, Seq("window", "merge")))
      bm25TopK(s, dir, "window merge", 10)
        .join(engine(s, dir).index.docstore.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("rank"), col("doc_id"), snippetUdf(col("text")).as("snippet"))
    }),
    // --- P2: deterministic dense docId assignment over a source-shaped table ---
    "q_src_docids" -> ((s, dir) => {
      val src = documents(s, dir).select(
        col("source").as("repo"),
        concat(lit("doc_"), lpad(col("doc_id").cast("string"), 8, "0")).as("path"),
        col("text").as("content"))
      DocIdAssigner.assign(src, Seq("repo", "path"), "src_doc_id")
        .select(col("repo"), col("path"), col("src_doc_id"))
    }),
    // --- sha256 content invariant (input_hint) ---
    "q_sha256" -> ((s, dir) => {
      documents(s, dir).select(col("doc_id"), sha2(col("text"), 256).as("sha"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_postings" ->
      s"""$tokCte,
         |posts AS (SELECT term, doc_id, count(*) AS tf FROM tok2 GROUP BY term, doc_id)
         |SELECT p.term, p.doc_id, p.tf, d.dl FROM posts p JOIN dls d ON p.doc_id = d.doc_id""".stripMargin,
    "q_doclen" -> s"$tokCte SELECT doc_id, dl FROM dls",
    "q_stats" -> s"$tokCte SELECT n, CAST(round(avgdl * 1e6) AS BIGINT) AS avgdl_micros FROM stats",
    "q_df" ->
      s"$tokCte SELECT term, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY term",
    "q_search_and" ->
      s"""$tokCte SELECT doc_id FROM tok2 WHERE term IN ${inList(Seq("data", "table", "join"))}
         |GROUP BY doc_id HAVING count(DISTINCT term) = 3""".stripMargin,
    "q_search_or" ->
      s"""$tokCte SELECT DISTINCT doc_id FROM tok2 WHERE term IN ${inList(Seq("spark", "stream", "vector"))}""".stripMargin,
    "q_search_not" ->
      s"""$tokCte SELECT doc_id FROM tok2 WHERE term IN ('join','row')
         |GROUP BY doc_id HAVING count(DISTINCT term) = 2
         |EXCEPT SELECT DISTINCT doc_id FROM tok2 WHERE term = 'filter'""".stripMargin,
    "q_bm25_topk" -> bm25Sql(Seq("table" -> 1, "scan" -> 1, "merge" -> 1), isOr = false, k = 20),
    "q_bm25_or_topk" -> bm25Sql(Seq("spark" -> 1, "stream" -> 1, "vector" -> 1), isOr = true, k = 20),
    "q_bm25_dup_topk" -> bm25Sql(Seq("the" -> 2, "fast" -> 1), isOr = false, k = 15),
    "q_snippets" -> {
      // reference snippet (snippet.cpp:12-34): earliest substring pos of any
      // term in the lowercased text; window 120 chars from max(0, pos - 40);
      // SQL strpos is 1-based, the reference is 0-based.
      s"""$tokCte,
         |${scoresCte(Seq("window" -> 1, "merge" -> 1), isOr = false)}
         |SELECT k.rank, k.doc_id,
         |  substr(d.text,
         |    CASE WHEN least(nullif(strpos(lower(d.text),'window'),0), nullif(strpos(lower(d.text),'merge'),0)) - 1 > 40
         |         THEN least(nullif(strpos(lower(d.text),'window'),0), nullif(strpos(lower(d.text),'merge'),0)) - 40
         |         ELSE 1 END,
         |    120) AS snippet
         |FROM ranked k JOIN documents d ON k.doc_id = d.doc_id WHERE k.rank <= 10""".stripMargin
    },
    "q_src_docids" ->
      """SELECT repo, path, row_number() OVER (ORDER BY repo, path) AS src_doc_id
        |FROM (SELECT source AS repo, 'doc_' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS path FROM documents)""".stripMargin,
    "q_sha256" -> "SELECT doc_id, sha256(text) AS sha FROM documents"
  )
}
