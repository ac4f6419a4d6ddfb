package graft
import org.apache.spark.sql.functions._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local(8, 8, "explain")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExtendedMode).linesIterator
        .filter(l => l.contains("Scan") || l.contains("ReadSchema") || l.contains("PushedFilters") || l.contains("Exchange") || l.contains("WholeStageCodegen") || l.contains("Broadcast"))
        .mkString("\n"))
    }
    show("q_doclen (docs scan pruning)", SparkEntry.queries("q_doclen")(spark, dir))
    show("q_bm25_topk", SparkEntry.queries("q_bm25_topk")(spark, dir))
    show("q_events_hourly", SparkEntry.queries("q_events_hourly")(spark, dir))
    show("q_ann_topk", SparkEntry.queries("q_ann_topk")(spark, dir))
    show("q_dedup_exact", SparkEntry.queries("q_dedup_exact")(spark, dir))
    show("q_phrase_topk", SparkEntry.queries("q_phrase_topk")(spark, dir))
    spark.stop()
  }
}
