package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion-side operators from the reference pipeline that precede the
  * index build (SURVEY §2.2).
  */
object Ingest {

  /** P3 — OCR policy predicate
    * (/root/reference/src/ingestion/ocr_policy.hpp:19-31): a document WOULD
    * need OCR when its text layer is too thin:
    * `did_ocr = len(text) < 50 || tokenCount < 10`, token count using THE
    * indexing tokenizer. Here it is a quality flag on source rows (no OCR
    * subprocess exists for code text — S3 is out of scope per SURVEY).
    */
  val MinTextChars = 50
  val MinTokenCount = 10

  def withOcrPolicy(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tok = graft.index.IndexBuilder.tokenizerCol(docs.sparkSession, codeAware = false)
    docs.withColumn(
      "did_ocr",
      length(col(textCol)) < MinTextChars || size(tok(col(textCol))) < MinTokenCount
    )
  }

  /** P1 — per-row error isolation
    * (/root/reference/src/ingestion/ingestion_pipeline.cpp:68-73: per-file
    * failures are swallowed, pipeline continues). Dataflow form: rows that
    * fail validation are routed to a bad-record side output instead of
    * failing the job. Returns (good, bad).
    */
  def validated(src: DataFrame): (DataFrame, DataFrame) = {
    val checked = src.withColumn(
      "_bad_reason",
      when(col("content").isNull, "null_content")
        .when(col("repo").isNull || col("path").isNull, "null_key")
        .when(length(col("content")) === 0, "empty_content")
        .otherwise(lit(null).cast("string"))
    )
    (
      checked.filter(col("_bad_reason").isNull).drop("_bad_reason"),
      checked.filter(col("_bad_reason").isNotNull)
    )
  }

  /** S4 — JSON array source (the reference's data/docs.json fixture shape,
    * apps/searchd/main.cpp:46-63): an array of {docId, text} objects.
    * Explicit schema, multiLine for a top-level array — never inference.
    */
  def loadDocsJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("docId", LongType),
        StructField("text", StringType)
      )))
      .option("multiLine", "true")
      .json(path)
      .select(col("docId").as("doc_id"), col("text"))
}
