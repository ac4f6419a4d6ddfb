package graft.search

import graft.SparkTestBase
import graft.core.{Bm25, GoldenFixture, RefEngine}
import graft.index.IndexBuilder

class SparkEngineSpec extends SparkTestBase {

  private def engineFor(docs: Seq[(Long, String)]): SearchEngine =
    new SearchEngine(IndexBuilder.build(docsDF(docs)).cache())

  for (c <- GoldenFixture.all) {
    test(s"Spark engine matches golden fixture '${c.name}'") {
      val eng = engineFor(c.documents)
      val got = eng.searchScored(c.query)
      assert(got.map(_._1) == c.expected.map(_._1))
      got.zip(c.expected).foreach { case ((_, s), (_, e)) =>
        assert(math.abs(s - e) < 1e-9, s"score $s vs $e")
      }
    }
  }

  test("Spark engine: AND / OR / NOT semantics") {
    val eng = engineFor(Seq(1L -> "alpha bravo", 2L -> "alpha charlie", 3L -> "bravo charlie"))
    assert(eng.search("alpha bravo") == Seq(1L))
    assert(eng.search("alpha -bravo") == Seq(2L))
    assert(eng.search("alpha OR bravo").toSet == Set(1L, 2L, 3L))
    assert(eng.search("zzz").isEmpty)
    assert(eng.search("").isEmpty)
    assert(eng.search("-alpha").isEmpty)
    // AND with a zero-df term -> empty
    assert(eng.search("alpha zzz").isEmpty)
    // OR with a zero-df term -> others still match
    assert(eng.search("alpha OR zzz").toSet == Set(1L, 2L))
  }

  test("Spark engine: stats match reference model") {
    val docs = Seq(1L -> "alpha bravo", 2L -> "alpha alpha bravo", 3L -> "charlie")
    val eng = engineFor(docs)
    val ref = new RefEngine
    docs.foreach { case (id, t) => ref.addDocument(id, t) }
    assert(eng.index.stats.n == ref.stats._1)
    assert(math.abs(eng.index.stats.avgdl - ref.stats._2) < 1e-12)
  }

  test("Spark engine: snippets on top-k") {
    val eng = engineFor(Seq(
      1L -> "Teamcenter migration guide: map attributes , validate schema, run dry-run.",
      2L -> "unrelated text entirely"))
    val hits = eng.searchWithSnippets("migration schema", k = 10)
    assert(hits.map(_.docId) == Seq(1L))
    val s = hits.head.snippet.toLowerCase
    assert(s.contains("migration") && s.contains("schema") && hits.head.snippet.length <= 120)
    // meta defaults to "" when the corpus has no source/lang columns
    assert(hits.head.source == "" && hits.head.lang == "")
  }

  test("Spark engine: hits carry doc metadata (source, lang)") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha bravo", "repoX", "en"),
      (2L, "bravo charlie", "repoY", "de")
    ).toDF("doc_id", "text", "source", "lang")
    val eng = new SearchEngine(graft.index.IndexBuilder.build(docs))
    val hits = eng.searchWithSnippets("alpha", k = 5)
    assert(hits.map(h => (h.docId, h.source, h.lang)) == Seq((1L, "repoX", "en")))
  }

  test("property: Spark engine rank- and score-identical to RefEngine on random corpora") {
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "x1")
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val nDocs = 1 + rnd.nextInt(20)
      val docs = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(12)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val eng = engineFor(docs)
      val ref = new RefEngine
      docs.foreach { case (id, t) => ref.addDocument(id, t) }
      val queries = Seq(
        "alpha", "alpha bravo", "alpha OR bravo", "alpha -bravo",
        "charlie delta OR echo", "alpha alpha", "-echo", "golf x1",
        "alpha bravo charlie OR delta -echo")
      for (q <- queries) {
        val got = eng.searchScored(q)
        val exp = ref.searchScored(q)
        assert(got.map(_._1) == exp.map(_._1), s"trial=$trial q='$q' got=$got exp=$exp")
        got.zip(exp).foreach { case ((_, a), (_, b)) =>
          assert(math.abs(a - b) < 1e-9, s"trial=$trial q='$q'")
        }
      }
    }
  }

  test("top-k is a prefix of the full ranking") {
    val docs = (1L to 10L).map(i => i -> s"rankterm token$i filler")
    val eng = engineFor(docs)
    val full = eng.searchScored("rankterm")
    val top3 = eng.searchScored("rankterm", k = 3)
    assert(top3 == full.take(3))
    val df3 = eng.topKDF("rankterm", 3).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(df3.map(_._1).toSet subsetOf full.take(4).map(_._1).toSet) // same modulo epsilon ties
  }
}
