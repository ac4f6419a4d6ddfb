package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.pipeline.Events

class StreamingSpec extends SparkTestBase {

  test("streaming hourly rollup == batch hourly rollup on the same input") {
    val sp = spark
    import sp.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val rnd = new scala.util.Random(5)
    val rows = (1L to 500L).map { i =>
      (i, ts(rnd.nextInt(600).toLong), i % 13, Seq("click", "view", "buy")(rnd.nextInt(3)),
        rnd.nextInt(1000) / 10.0, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val dir = Files.createTempDirectory("graft-stream").toString
    df.coalesce(2).write.mode("overwrite").parquet(dir)

    EventStream.runAvailableNow(spark, dir, "rollup_sink")
    val streaming = spark.table("rollup_sink").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    val batch = Events.hourlyRollup(spark.read.parquet(dir)).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    assert(streaming == batch)
    assert(batch.nonEmpty)
  }
}

class SourceTableSpec extends SparkTestBase {
  import graft.sources.SourceTable

  test("synthetic source: deterministic, schema-exact, sha invariant verifiable") {
    val a = SourceTable.synthetic(spark, 500)
    val b = SourceTable.synthetic(spark, 500)
    assert(a.schema.fieldNames.toSeq == Seq("repo", "path", "commit", "lang", "content"))
    val ha = a.selectExpr("sha2(concat_ws('|', repo, path, commit, lang, content), 256) h")
      .agg(org.apache.spark.sql.functions.expr("bit_xor(cast(conv(substr(h,1,15),16,10) as bigint))")).collect()(0)
    val hb = b.selectExpr("sha2(concat_ws('|', repo, path, commit, lang, content), 256) h")
      .agg(org.apache.spark.sql.functions.expr("bit_xor(cast(conv(substr(h,1,15),16,10) as bigint))")).collect()(0)
    assert(ha == hb) // generation is seed-stable
    assert(a.count() == 500)

    val withSha = SourceTable.withSha(a)
    assert(SourceTable.verifyInvariant(withSha) == 0L)
    // corrupt one row -> invariant catches it
    val corrupted = withSha.withColumn("content",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("path").endsWith("000000000003.scala"),
        org.apache.spark.sql.functions.lit("tampered")
      ).otherwise(org.apache.spark.sql.functions.col("content")))
    assert(SourceTable.verifyInvariant(corrupted) >= 1L)
  }

  test("code-aware tokens index camelCase identifiers from synthetic code") {
    val src = SourceTable.synthetic(spark, 50)
    val tokens = src.select(graft.index.IndexBuilder.codeTokenizeUdf(
      org.apache.spark.sql.functions.col("content")).as("t"))
      .selectExpr("explode(t) term").distinct().collect().map(_.getString(0)).toSet
    // "handleHTTPResponse" must yield the folded original AND the sub-tokens
    if (tokens.contains("handlehttpresponse"))
      assert(tokens.contains("handle") && tokens.contains("http") && tokens.contains("response"))
  }
}
