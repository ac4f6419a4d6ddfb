package graft.expr

import graft.SparkTestBase
import graft.core.Tokenizer
import org.apache.spark.sql.functions._

class RefTokenizeSpec extends SparkTestBase {

  test("native expression == pure tokenizer on varied inputs (incl non-ASCII)") {
    val sp = spark
    import sp.implicits._
    RefTokenize.register(spark)
    val inputs = Seq(
      "Foo-Bar Baz", "Hello, World! 123", "", "...", "a\tb", "café naïve",
      "x1y2", "parseHTTPRequest2 snake_case_bar", "中文 mixed ASCII42",
      "UPPER lower 0099", " leading and trailing ", "a-b-c_d.e/f"
    )
    val df = inputs.toDF("text")
    val got = df.selectExpr("ref_tokenize_native(text) AS t").collect()
      .map(_.getSeq[String](0).toList)
    inputs.zip(got).foreach { case (in, g) =>
      assert(g == Tokenizer.tokenize(in).toList, s"input='$in'")
    }
  }

  test("native expression survives whole-stage codegen in a real aggregation") {
    val sp = spark
    import sp.implicits._
    RefTokenize.register(spark)
    val df = (1 to 100).map(i => (i.toLong, s"Alpha bravo${i % 5} CHARLIE-$i")).toDF("doc_id", "text")
    df.createOrReplaceTempView("docs_rt")
    val viaSql = spark.sql(
      "SELECT term, count(*) AS c FROM (SELECT explode(ref_tokenize_native(text)) term FROM docs_rt) GROUP BY term")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaUdf = df.select(explode(graft.index.IndexBuilder.tokenizeUdf(col("text"))).as("term"))
      .groupBy("term").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaUdf)
    // the plan should contain WholeStageCodegen around the project
    val plan = spark.sql("SELECT explode(ref_tokenize_native(text)) FROM docs_rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // asterisk = inside WholeStageCodegen
  }
  test("fused ref_tokenize_tf: dl and tf counts match the pure tokenizer") {
    val sp = spark
    import sp.implicits._
    graft.expr.RefTokenizeTf.register(spark)
    val inputs = Seq(
      "Foo-Bar Baz foo BAR bar", "Hello, World! 123 hello", "", "...",
      "a a a b", "caf\u00e9 na\u00efve caf\u00e9", "x1y2 X1Y2", " dup dup DUP "
    )
    val rows = inputs.toDF("text")
      .selectExpr("ref_tokenize_tf(text) AS tt")
      .select(col("tt.dl"), col("tt.tfmap"))
      .collect()
    inputs.zip(rows).foreach { case (in, r) =>
      val toks = Tokenizer.tokenize(in)
      assert(r.getInt(0) == toks.size, s"dl mismatch for '$in'")
      val got = r.getMap[String, Int](1).toMap
      val exp = toks.groupBy(identity).map { case (t, v) => t -> v.size }
      assert(got == exp, s"tfmap mismatch for '$in': got=$got exp=$exp")
    }
  }
}
