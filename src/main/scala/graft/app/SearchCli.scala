package graft.app

import graft.index.IndexBuilder
import graft.search.SearchEngine
import graft.spark.Sessions

/** CLI twin of the reference's `searchd` app (one-shot batch mode):
  * build the index over a parquet corpus and answer queries, printing
  * ranked JSON hits ({docId, score, snippet} — the reference's /search
  * response shape, apps/searchd/main.cpp:474-489).
  *
  * Usage: SearchCli <corpus.parquet> <k> <query> [<query> ...]
  *
  * Queries of the form `phrase:<text>` / `prefix:<p>` / `fuzzy:<t>` /
  * `wildcard:<pat>` run the matching extension (SURVEY §2.12) instead of
  * the reference query language; plain queries keep the reference-exact
  * semantics.
  */
object SearchCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: SearchCli <corpus.parquet> <k> <query>...")
    val Array(corpus, kStr) = args.take(2)
    val k = math.max(1, kStr.toInt)
    val queries = args.drop(2).toSeq

    val spark = Sessions.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      shufflePartitions = 8,
      appName = "graft-search-cli")
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(corpus)
    val engine = new SearchEngine(IndexBuilder.build(docs).cache())
    val stats = engine.index.stats
    System.err.println(s"[graft] indexed n=${stats.n} docs, avgdl=${stats.avgdl}")

    import graft.core.JsonText.esc

    queries.foreach { q =>
      val hits =
        if (q.startsWith("phrase:")) engine.searchPhraseWithSnippets(q.substring(7), k)
        else if (q.startsWith("prefix:")) engine.searchPrefixWithSnippets(q.substring(7), k)
        else if (q.startsWith("fuzzy:")) engine.searchFuzzyWithSnippets(q.substring(6), k)
        else if (q.startsWith("wildcard:")) engine.searchWildcardWithSnippets(q.substring(9), k)
        else engine.searchWithSnippets(q, k)
      val body = hits.map(h =>
        s"""{"docId":${h.docId},"score":${h.score},"snippet":"${esc(h.snippet)}",""" +
          s""""source":"${esc(h.source)}","lang":"${esc(h.lang)}"}"""
      ).mkString("[", ",", "]")
      println(s"""{"query":"${esc(q)}","results":$body}""")
    }
    spark.stop()
  }
}
