package graft.app

import org.apache.spark.sql.SparkSession

import graft.search.SegmentSearch

/** EP2 — the spark-submit batch query job over a built segment index
  * (reference: `searchd --serve` + /search, SURVEY §3.2 — batch query sets
  * are how the baseline measures QPS).
  *
  * Usage: QueryJob <indexDir> <k> <query> [<query> ...]
  * Prints one JSON line per query: {"query":…,"results":[{docId,score}…]}.
  *
  * Queries of the form `phrase:<text>` / `prefix:<p>` / `fuzzy:<t>` /
  * `wildcard:<pat>` run the matching distributed extension
  * (SegmentSearch.phraseBatch / prefixBatch / fuzzyBatch / wildcardBatch —
  * SURVEY §2.12); plain queries keep the reference-exact language.
  */
object QueryJob {
  def main(args: Array[String]): Unit = {
    if (args.contains("--help")) { println("usage: QueryJob <indexDir> <k> <query>..."); return }
    if (args.length < 3) { System.err.println("usage: QueryJob <indexDir> <k> <query>..."); sys.exit(2) }
    val indexDir = args(0)
    val k = math.max(1, args(1).toInt)
    val queries = args.drop(2).toSeq

    // under spark-submit the master comes from the launcher; when driven
    // directly (sbt runMain / tests) fall back to local[*]
    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().getOrCreate()
      else graft.spark.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, 16, "graft-job")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (phraseQ, rest0) = queries.zipWithIndex.partition(_._1.startsWith("phrase:"))
      val (expandedQ, plainQ) = rest0.partition { case (q, _) =>
        q.startsWith("prefix:") || q.startsWith("fuzzy:") || q.startsWith("wildcard:") }
      val plainRes =
        if (plainQ.isEmpty) Map.empty[Int, Seq[(Long, Double)]]
        else SegmentSearch.searchBatch(spark, indexDir, plainQ.map(_._1), k)
      val phraseRes =
        if (phraseQ.isEmpty) Map.empty[Int, Seq[(Long, Double)]]
        else SegmentSearch.phraseBatch(spark, indexDir, phraseQ.map(_._1.substring(7)), k)
      val expandedRes: Map[Int, Seq[(Long, Double)]] = expandedQ.map { case (q, orig) =>
        orig -> (if (q.startsWith("prefix:")) SegmentSearch.prefixBatch(spark, indexDir, q.substring(7), k)
                 else if (q.startsWith("fuzzy:")) SegmentSearch.fuzzyBatch(spark, indexDir, q.substring(6), k)
                 else SegmentSearch.wildcardBatch(spark, indexDir, q.substring(9), k))
      }.toMap
      val byInput: Map[Int, Seq[(Long, Double)]] =
        plainQ.map(_._2).zipWithIndex.map { case (orig, j) => orig -> plainRes(j) }.toMap ++
          phraseQ.map(_._2).zipWithIndex.map { case (orig, j) => orig -> phraseRes(j) }.toMap ++
          expandedRes
      import graft.core.JsonText.esc
      queries.zipWithIndex.foreach { case (q, i) =>
        val hits = byInput(i).map { case (d, s) => s"""{"docId":$d,"score":$s}""" }.mkString("[", ",", "]")
        println(s"""{"query":"${esc(q)}","results":$hits}""")
      }
    } catch {
      case e: Throwable => System.err.println(s"query job failed: ${e.getMessage}"); sys.exit(3)
    }
  }
}
