package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's upstream source table per BASELINE.json input_hint:
  *
  *   src_files(repo string, path string, commit string, lang string,
  *             content string)
  *
  * In-sandbox it is a Parquet-backed table behind this thin reader (no
  * Iceberg runtime jar ships in /opt/spark/jars); on a real cluster the same
  * code reads a true Iceberg table via `spark.read.table(name)` with catalog
  * config in spark-submit — only `load` changes.
  *
  * Invariant (input_hint): `sha256(content)` is computed at ingest and
  * re-verified at every materialization boundary (`verifyInvariant`).
  */
object SourceTable {

  val schema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("content", StringType, nullable = false)
  ))

  def load(spark: SparkSession, pathOrTable: String): DataFrame =
    if (pathOrTable.contains("/")) {
      // Fail fast on a wrong-shaped file: an explicit read schema makes Spark
      // silently NULL-fill columns the parquet lacks, which surfaces five
      // stages later as an NPE deep in the segment writer. Footer-only check.
      // case-insensitive: Spark's schema resolution is case-insensitive by
      // default, so Repo/Content etc. are valid — only truly absent columns fail
      val actual = spark.read.parquet(pathOrTable).schema.fieldNames.map(_.toLowerCase).toSet
      val missing = schema.fieldNames.filterNot(f => actual(f.toLowerCase))
      require(
        missing.isEmpty,
        s"source table at $pathOrTable lacks required column(s) ${missing.mkString(", ")} " +
          s"(found: ${actual.toSeq.sorted.mkString(", ")}; expected the input_hint shape " +
          "repo/path/commit/lang/content)")
      spark.read.schema(schema).parquet(pathOrTable)
    } else spark.read.table(pathOrTable)

  /** Attach the ingest-time invariant column. */
  def withSha(src: DataFrame): DataFrame =
    src.withColumn("content_sha", sha2(col("content"), 256))

  /** Re-verify the invariant on a materialization that carries
    * (content, content_sha): returns the number of VIOLATING rows (0 = ok).
    */
  def verifyInvariant(df: DataFrame): Long =
    df.filter(sha2(col("content"), 256) =!= col("content_sha")).count()

  /** Deterministic synthetic generator (seed-stable, no wall clock): code-like
    * content over a fixed vocabulary + camelCase/snake_case identifiers so
    * both reference-mode and code-aware tokenization are exercised
    * (FIXTURES.md §1). Pure column expressions — generation itself scales.
    */
  def synthetic(spark: SparkSession, rows: Long, reposPer1000: Int = 20): DataFrame = {
    val langs = array(lit("scala"), lit("java"), lit("py"), lit("c"), lit("md"))
    val words = Seq(
      "def", "val", "class", "object", "import", "return", "match", "case",
      "parseRequest", "handleHTTPResponse", "snake_case_util", "camelCaseHelper",
      "buildIndex", "mergeSegments", "tokenStream", "queryPlan", "shuffle_service",
      "x", "y", "idx", "tmp", "buf", "acc", "foo", "bar")
    val wordArr = array(words.map(lit): _*)

    val base = spark.range(rows).select(col("id"))
    // xorshift-ish deterministic mix per (id, slot) via sha-free arithmetic
    def mix(slot: Int) = pmod(hash(col("id"), lit(slot)).cast("long"), lit(words.size))
    val contentCols = (0 until 24).map(s => element_at(wordArr, (mix(s) + lit(1)).cast("int")))
    base.select(
      concat(lit("org"), pmod(col("id"), lit(reposPer1000.toLong)).cast("string"),
        lit("/repo"), pmod(hash(col("id")).cast("long"), lit(97L)).cast("string")).as("repo"),
      concat(lit("src/"), pmod(hash(col("id"), lit(7)).cast("long"), lit(11L)).cast("string"),
        lit("/file_"), lpad(col("id").cast("string"), 12, "0"), lit(".scala")).as("path"),
      sha2(concat(lit("commit:"), col("id").cast("string")), 256).substr(1, 40).as("commit"),
      element_at(langs, (pmod(hash(col("id"), lit(3)).cast("long"), lit(5L)) + lit(1)).cast("int")).as("lang"),
      concat_ws(" ", contentCols: _*).as("content")
    )
  }
}
