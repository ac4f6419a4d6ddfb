package graft.bench

import org.apache.spark.sql.functions._

/** Interleaved A/B of the docstore projection: fused native ref_tokenize_tf
  * vs native-tokenize + counting-UDF. Both sides force identical downstream
  * work (sum of dl + sum of distinct-term counts). Best-of-3 interleaved so
  * VM throttle drift hits both arms equally.
  */
object TfAb {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local(32, 32, "tf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Workload.replicatedDocs(spark, "/root/testdata/sf0.1", 64)
      .select("doc_id", "text").repartition(64).persist()
    println(s"docs=${docs.count()}")
    graft.expr.RefTokenizeTf.register(spark)
    graft.expr.RefTokenize.register(spark)
    val countsUdf = udf { (tokens: Seq[String]) =>
      val m = scala.collection.mutable.HashMap[String, Int]()
      tokens.foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
      m.toMap
    }

    def fused() = docs
      .withColumn("tt", call_function("ref_tokenize_tf", col("text")))
      .select(col("tt.dl").as("dl"), size(map_keys(col("tt.tfmap"))).as("nt"))
      .agg(sum("dl"), sum("nt")).collect()(0)

    def udfPath() = docs
      .withColumn("toks", call_function("ref_tokenize_native", col("text")))
      .select(size(col("toks")).as("dl"), size(map_keys(countsUdf(col("toks")))).as("nt"))
      .agg(sum("dl"), sum("nt")).collect()(0)

    fused(); udfPath() // warm JIT both
    for (round <- 1 to 3) {
      val (ra, ta) = Workload.timed(fused())
      val (rb, tb) = Workload.timed(udfPath())
      require(ra == rb, s"$ra != $rb")
      println(f"round $round: fused=$ta%.2fs udf=$tb%.2fs")
    }
    spark.stop()
  }
}
