package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tokenizer

/** Logical index tables (the dataflow form of the reference's in-memory maps,
  * /root/reference/src/core/inverted_index.h:26-28 and search_service.h:43-53):
  *
  *   postings: (term string, doc_id long, tf int)        — term -> (doc -> tf)
  *   docstore: (doc_id long, text string, dl int)        — doc text + length
  *   dfTable:  (term string, df long)                    — per-term doc count
  *   stats:    n (doc count), avgdl (mean token count)   — corpus scalars
  *
  * All four are plain DataFrames so Catalyst owns the physical plan (partial
  * aggregation, shuffle placement, AQE). The compressed/segmented form used by
  * the serve path is built from these (graft.index.SegmentIndex).
  */
final case class IndexStats(n: Long, avgdl: Double)

final class IndexTables(
    val postings: DataFrame,
    val docstore: DataFrame,
    val dfTable: DataFrame,
    statsDf: DataFrame
) {
  /** Corpus scalars, computed once and cached on first use (the reference
    * recomputes them per insert — an inefficiency, not semantics; SURVEY A4).
    */
  lazy val stats: IndexStats = {
    val row = statsDf.collect()(0)
    IndexStats(row.getLong(0), if (row.isNullAt(1)) 0.0 else row.getDouble(1))
  }

  def cache(): this.type = {
    postings.cache(); docstore.cache(); dfTable.cache(); this
  }

  def unpersist(): Unit = {
    postings.unpersist(); docstore.unpersist(); dfTable.unpersist()
  }
}

object IndexBuilder {

  /** Per-doc metadata carried through the docstore and emitted on hits —
    * the code-corpus twin of the reference's DocMeta file_name/page_number
    * (/root/reference/src/core/search_service.h:19-26). Missing input
    * columns surface as empty strings so the docstore schema is stable.
    */
  val MetaCols: Seq[String] = Seq("source", "lang")

  def metaColumns(docs: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Column] =
    MetaCols.map(c => (if (docs.columns.contains(c)) col(c) else lit("")).as(c))

  /** Reference-mode tokenizer as a Spark function. A Scala UDF is
    * semantics-exact (SURVEY F1); the hot path of the segment build uses the
    * same function inside mapPartitions so the UDF never bottlenecks there.
    */
  val tokenizeUdf = udf((s: String) => Tokenizer.tokenize(s))
  val codeTokenizeUdf = udf((s: String) => Tokenizer.codeTokens(s))

  /** Tokenizer as a Column: reference mode uses the native Catalyst
    * expression (codegen-resident, byte-wise — graft.expr.RefTokenize);
    * code-aware mode uses the Scala UDF. Parity native==pure is asserted in
    * RefTokenizeSpec.
    */
  def tokenizerCol(spark: SparkSession, codeAware: Boolean): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    if (codeAware) c => codeTokenizeUdf(c)
    else {
      graft.expr.RefTokenize.register(spark)
      c => call_function("ref_tokenize_native", c)
    }

  def registerSql(spark: SparkSession): Unit = {
    spark.udf.register("ref_tokenize", (s: String) => Tokenizer.tokenize(s))
    spark.udf.register("code_tokenize", (s: String) => Tokenizer.codeTokens(s))
  }

  /** Build the index tables from a corpus DataFrame with columns
    * (`idCol` long, `textCol` string).
    *
    * Plan shape (EP1, SURVEY §3.1): one projection with the tokenizer, then
    *   A1  groupBy(term, doc_id).count       — partial+final hash aggregate
    *   A2  groupBy(term).count               — from A1's output, no rescan
    *   A3  size(tokens)                      — free in the same projection
    *   A4  agg(count, avg(dl))               — one-row stats
    * At 100 TB the only wide exchange is A1's shuffle on (term, doc_id);
    * map-side partial aggregation collapses per-partition duplicates first.
    */
  def build(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      codeAware: Boolean = false
  ): IndexTables = {
    val base = docs.select(
      Seq(col(idCol).cast("long").as("doc_id"), col(textCol).as("text")) ++
        metaColumns(docs): _*
    )

    // dl is denormalized onto every posting row (like a norms file in a real
    // search index): the scorer then needs NO join with the docstore — the
    // tf AND dl travel with the row (obsoletes the reference's O(1) tf-lookup
    // map, inverted_index.cpp:48-54).
    //
    // Reference mode: the fused native expression yields (dl, term->tf map)
    // in ONE byte scan per doc, and exploding the map REPLACES the classic
    // groupBy(term, doc_id) — A1's wide exchange disappears from the
    // dataflow path entirely (tf is row-local: a doc's terms never span
    // rows). Code-aware mode keeps the Scala tokenizer + explode + groupBy.
    val (docstore, postings) =
      if (!codeAware) {
        graft.expr.RefTokenizeTf.register(docs.sparkSession)
        val t = base.withColumn("tt", call_function("ref_tokenize_tf", col("text")))
        val store = t.select(
          Seq(col("doc_id"), col("text"), col("tt.dl").as("dl")) ++ MetaCols.map(col): _*
        )
        val posts = t
          .select(col("doc_id"), col("tt.dl").as("dl"), explode(col("tt.tfmap")).as(Seq("term", "tf")))
          .select(col("term"), col("doc_id"), col("tf").cast("int").as("tf"), col("dl"))
        (store, posts)
      } else {
        val t = base.withColumn("tokens", codeTokenizeUdf(col("text")))
        val store = t.select(
          Seq(col("doc_id"), col("text"), size(col("tokens")).as("dl")) ++ MetaCols.map(col): _*
        )
        val posts = t
          .select(col("doc_id"), size(col("tokens")).as("dl"), explode(col("tokens")).as("term"))
          .groupBy(col("term"), col("doc_id"), col("dl"))
          .agg(count(lit(1)).cast("int").as("tf"))
          .select(col("term"), col("doc_id"), col("tf"), col("dl"))
        (store, posts)
      }

    val dfTable = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val stats = docstore.agg(
      count(lit(1)).as("n"),
      avg(col("dl")).as("avgdl")
    )

    new IndexTables(postings, docstore, dfTable, stats)
  }
}
