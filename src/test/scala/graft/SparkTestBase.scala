package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all suites (one JVM-wide session). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = graft.spark.Sessions.local(cores = 4, shufflePartitions = 4, appName = "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.spark

  def docsDF(docs: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    docs.toDF("doc_id", "text")
  }
}
