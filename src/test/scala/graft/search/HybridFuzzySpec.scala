package graft.search

import graft.SparkTestBase
import graft.core.EditDistance
import graft.index.IndexBuilder

/** Phase-11 extensions: hybrid lexical+vector RRF fusion, typo-tolerant
  * (fuzzy) expansion, and the RAG context pack.
  */
class HybridFuzzySpec extends SparkTestBase {

  // -------------------------------------------------------------- did you mean

  test("didYouMean: exact presence wins, else argmax df (ties byte-lex), else itself; serving == dataflow") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha alphx beta"),
      (4L, "alphx"), (5L, "alphx gamma"), (6L, "alphx delta"),
      (7L, "zetx zetz")
    )
    // df(alpha)=3 < df(alphx)=4: exact presence must still win for 'alpha'
    val eng = new SearchEngine(IndexBuilder.build(docsDF(docs)))
    val got = eng.didYouMeanDF("alpha alphz zety qqq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "alpha", "alpha", 3L), // in-vocab: itself, even with a denser neighbor
      (2L, "alphz", "alphx", 4L), // oov: highest-df within lev 1
      (3L, "zety", "zetx", 1L),   // df tie (zetx/zetz both 1): byte-lex asc
      (4L, "qqq", "qqq", 0L)      // no candidate: itself, df 0
    ), got.toString)

    // serving twin over segments: global df = sum of local dfs -> identical
    val dir = java.nio.file.Files.createTempDirectory("graft-dym").toString
    graft.index.SegmentIndex.build(docsDF(docs), dir, buckets = 3)
    val meta = graft.index.SegmentIndex.readMeta(dir)
    val segs = graft.index.SegmentIndex.liveSegmentFiles(dir, meta)
      .map(graft.index.SegmentIndex.loadSegment(_)).toIndexedSeq
    val serving = new SegmentSearch.ServingEngine(segs, meta)
    assert(serving.didYouMean("alpha alphz zety qqq") == got)
  }

  // -------------------------------------------------------------- EditDistance

  private def naiveLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("EditDistance matches the naive DP on an exhaustive small-alphabet sweep") {
    val alphabet = Seq('a', 'b', 'c')
    val words = (0 to 4).flatMap { len =>
      (0 until math.pow(3, len).toInt).map { n =>
        var x = n
        (0 until len).map { _ => val c = alphabet(x % 3); x /= 3; c }.mkString
      }
    }
    for (a <- words; b <- words) {
      val expect = naiveLev(a, b)
      assert(EditDistance.dist(a, b) == expect, s"dist('$a','$b')")
      for (m <- 0 to 3)
        assert(EditDistance.within(a, b, m) == (expect <= m), s"within('$a','$b',$m)")
    }
  }

  test("EditDistance long-string band: early exit stays correct") {
    assert(EditDistance.within("abcdefghij", "abcdefghij", 0))
    assert(EditDistance.within("abcdefghij", "abcdefghix", 1))
    assert(!EditDistance.within("abcdefghij", "jihgfedcba", 3))
    assert(EditDistance.within("kitten", "sitting", 3))
    assert(!EditDistance.within("kitten", "sitting", 2))
  }

  // ------------------------------------------------------------------ fixtures

  private def corpus = {
    val sp = spark
    import sp.implicits._
    Seq(
      (0L, "fast scan and merge join paths", "r1", "en"),
      (1L, "hash join with a fast probe", "r1", "en"),
      (2L, "merge join merge join merge", "r2", "de"),
      (3L, "sort sort sort scan", "r2", "en"),
      (4L, "hash hash table build side", "r2", "de"),
      (5L, "a fast hash for a fast scan", "r3", "en")
    ).toDF("doc_id", "text", "source", "lang")
  }

  private def embeddings = {
    val sp = spark
    import sp.implicits._
    // 4-dim unit-ish vectors: ids 0/1/5 mutually close, 2/3/4 a second cluster
    Seq(
      (0L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.2f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 0.1f, 1.0f, 0.2f)),
      (3L, Seq(0.1f, 0.0f, 0.9f, 0.3f)),
      (4L, Seq(0.0f, 0.2f, 0.8f, 0.1f)),
      (5L, Seq(0.95f, 0.15f, 0.05f, 0.0f))
    ).toDF("vec_id", "embedding")
  }

  private def engine = new SearchEngine(IndexBuilder.build(corpus).cache())

  // -------------------------------------------------------------------- hybrid

  test("hybridTopK equals a driver-side RRF model of its own two legs") {
    val eng = engine
    // lexical leg model: micro-rank of scoredDF("fast hash") candidates
    val lex = eng.scoredDF(graft.core.QueryParser.parse("fast hash"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
      .sortBy { case (d, s) => (-s, d) }.take(50)
      .zipWithIndex.map { case ((d, _), i) => d -> (i + 1L) }.toMap
    // vector leg model from the operator's own contract output
    val vec = graft.pipeline.Similarity.bruteForceTopK(embeddings, Seq(0L), 50)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap

    def contrib(r: Option[Long]) = r.fold(0L)(x => 1000000L / (60L + x))
    val ids = (lex.keySet ++ vec.keySet).toSeq
    val expect = ids
      .map(d => (d, contrib(lex.get(d)) + contrib(vec.get(d)), lex.getOrElse(d, 0L), vec.getOrElse(d, 0L)))
      .sortBy { case (d, rrf, _, _) => (-rrf, d) }
      .zipWithIndex.map { case ((d, rrf, lr, vr), i) => (i + 1L, d, rrf, lr, vr) }
      .take(3)

    val got = Hybrid.hybridTopK(eng, embeddings, "fast hash", queryVecId = 0L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
  }

  test("hybrid: a vector-only doc can outrank a weak lexical-only doc") {
    // query "merge" never matches doc 5; doc 5 is vec-nearest to 0
    val got = Hybrid.hybridTopK(engine, embeddings, "merge", queryVecId = 0L, k = 6)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    val doc5 = got.find(_._1 == 5L).get
    assert(doc5._2 == 0L && doc5._3 == 1L) // lexical-absent, vector rank 1
    // every returned row has at least one leg present
    assert(got.forall { case (_, lr, vr) => lr > 0 || vr > 0 })
  }

  test("hybridTopKIvf agrees with brute when probes cover the query's cluster") {
    // 2 centroids over 6 vectors: with nprobe=2 every cell is probed, so the
    // IVF leg IS the brute leg and the fusions must match exactly.
    val brute = Hybrid.hybridTopK(engine, embeddings, "fast hash", 0L, k = 6)
      .collect().map(_.toSeq).toSeq
    val ivf = Hybrid.hybridTopKIvf(engine, embeddings, "fast hash", 0L, k = 6,
      numCentroids = 2, nprobe = 2)
      .collect().map(_.toSeq).toSeq
    assert(ivf == brute)
  }

  // --------------------------------------------------------------------- fuzzy

  test("fuzzyScoredDF expands to the distance-1 dictionary neighborhood, OR-mode") {
    val eng = engine
    // 'hasx' -> {hash} only; 'hast' -> {fast, hash}
    val one = eng.fuzzyScoredDF("hasx", maxDist = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = eng.scoredDF(graft.core.QueryParser.parse("hash")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one == direct)

    val two = eng.fuzzyScoredDF("hast", maxDist = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val orBoth = eng.scoredDF(graft.core.ParsedQuery(Seq("fast", "hash"), Nil, isOr = true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(two == orBoth)

    assert(eng.fuzzyScoredDF("zzzzzz", maxDist = 1).collect().isEmpty)
    assert(eng.fuzzyScoredDF("two words", maxDist = 1).collect().isEmpty)
  }

  // --------------------------------------------------------------- context pack

  test("contextPackDF carries rank/citation/snippet and matches the facade") {
    val eng = engine
    val rows = eng.contextPackDF("fast hash", 5).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4), r.getString(5)))
    val facade = eng.searchWithSnippets("fast hash", 5)
    assert(rows.length == facade.length)
    rows.zip(facade).foreach { case ((rank, id, source, lang, snippet), hit) =>
      assert(id == hit.docId && source == hit.source && lang == hit.lang && snippet == hit.snippet,
        s"rank $rank")
    }
  }
}
