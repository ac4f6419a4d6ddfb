package graft.app

import org.apache.spark.sql.SparkSession

/** Tiny probe: proves spark.sql.extensions=graft.spark.GraftExtensions
  * registers the native tokenizer in a fresh session (the spark-submit path).
  */
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val got = spark.sql("SELECT ref_tokenize_native('Foo-Bar Baz') AS t")
      .collect()(0).getSeq[String](0)
    println(s"EXTPROBE tokens=$got")
    assert(got == Seq("foo", "bar", "baz"))
    spark.stop()
  }
}
