package graft.search

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.index.IndexBuilder

class LtrSpec extends SparkTestBase {

  private lazy val eng = new SearchEngine(IndexBuilder.build(docsDF(Seq(
    1L -> "alpha beta alpha gamma",
    2L -> "alpha alpha alpha",
    3L -> "beta beta delta epsilon zeta eta",
    4L -> "gamma delta",
    5L -> "alpha beta"
  ))).cache())

  test("featuresDF: integer coverage/length/tf features + BM25 micros over OR candidates") {
    val rows = Ltr.featuresDF(eng, "alpha beta").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // OR candidates: docs containing alpha or beta = 1,2,3,5
    assert(rows.keySet == Set(1L, 2L, 3L, 5L))
    // (f_bm25_r checked against scoredDF below) f_matched, f_dl, f_tfsum, f_maxtf
    assert(rows(1L)._2 == 2 && rows(1L)._3 == 4 && rows(1L)._4 == 3 && rows(1L)._5 == 2) // alpha x2, beta x1
    assert(rows(2L)._2 == 1 && rows(2L)._3 == 3 && rows(2L)._4 == 3 && rows(2L)._5 == 3)
    assert(rows(3L)._2 == 1 && rows(3L)._3 == 6 && rows(3L)._4 == 2 && rows(3L)._5 == 2)
    assert(rows(5L)._2 == 2 && rows(5L)._3 == 2 && rows(5L)._4 == 2 && rows(5L)._5 == 1)
    // f_bm25_r is exactly micros(scoredDF) for the same OR query
    val expected = eng.scoredDF(graft.core.ParsedQuery(Seq("alpha", "beta"), Nil, isOr = true))
      .select(col("doc_id"), round(col("score") * lit(1e6)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.view.mapValues(_._1).toMap == expected)
  }

  test("rerankDF: identity weights reproduce the BM25 micro order; coverage weight reorders") {
    val feats = Ltr.featuresDF(eng, "alpha beta")
    val identity = Ltr.rerankDF(feats, Ltr.Weights(1, 0, 0, 0, 0), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bm25Order = feats.collect()
      .map(r => (r.getLong(1), r.getLong(0))) // (f_bm25_r, doc_id)
      .sortBy { case (s, id) => (-s, id) }
    assert(identity.map(_._2).toSeq == bm25Order.map(_._2).toSeq)
    assert(identity.map(_._3).toSeq == bm25Order.map(_._1).toSeq)
    assert(identity.map(_._1).toSeq == (1L to identity.length).toSeq)
    // model = coverage only: both-term docs (1, 5) outrank single-term docs,
    // ties by doc_id asc
    val cov = Ltr.rerankDF(feats, Ltr.Weights(0, 1, 0, 0, 0), 10).collect().map(_.getLong(1))
    assert(cov.toSeq == Seq(1L, 5L, 2L, 3L))
    // k truncates after the full rank
    assert(Ltr.rerankDF(feats, Ltr.Weights(0, 1, 0, 0, 0), 2).collect().map(_.getLong(1)).toSeq
      == Seq(1L, 5L))
  }

  test("fit: exact recovery of a planted linear model at lambda = 0") {
    val sp = spark
    import sp.implicits._
    val data = (0 until 60).map { i =>
      val x1 = i.toDouble
      val x2 = ((i * 7) % 13).toDouble
      val x3 = ((i * 3) % 5).toDouble
      (x1, x2, x3, 4.0 - 1.5 * x1 + 0.25 * x2 + 2.0 * x3)
    }.toDF("x1", "x2", "x3", "y")
    val (b, w) = Ltr.fit(data, Seq("x1", "x2", "x3"), "y")
    assert(math.abs(b - 4.0) < 1e-8, s"intercept $b")
    assert(math.abs(w(0) + 1.5) < 1e-8 && math.abs(w(1) - 0.25) < 1e-8 && math.abs(w(2) - 2.0) < 1e-8,
      w.toSeq.toString)
  }

  test("fit: ridge shrinks coefficients but not the intercept toward the mean") {
    val sp = spark
    import sp.implicits._
    val data = (0 until 40).map { i =>
      val x = (i % 10).toDouble
      (x, 1.0 + 0.5 * x)
    }.toDF("x", "y")
    val (_, w0) = Ltr.fit(data, Seq("x"), "y", lambda = 0.0)
    val (bR, wR) = Ltr.fit(data, Seq("x"), "y", lambda = 1e4)
    assert(math.abs(wR(0)) < math.abs(w0(0)))
    // with w ~ 0, the unpenalized intercept approaches mean(y)
    val meanY = 1.0 + 0.5 * 4.5
    assert(math.abs(bR - meanY) < 0.2, s"bR=$bR meanY=$meanY")
  }

  test("fit: collinear features fail loudly at lambda 0 and solve under ridge") {
    val sp = spark
    import sp.implicits._
    val data = (0 until 20).map { i =>
      val x = i.toDouble
      (x, 2.0 * x, x + 1.0)
    }.toDF("x1", "x2", "y")
    val e = intercept[IllegalArgumentException] {
      Ltr.fit(data, Seq("x1", "x2"), "y")
    }
    assert(e.getMessage.contains("singular"))
    val (_, w) = Ltr.fit(data, Seq("x1", "x2"), "y", lambda = 1e-6)
    // prediction still correct even though the split between x1/x2 is free
    assert(math.abs((w(0) + 2.0 * w(1)) - 1.0) < 1e-3, w.toSeq.toString)
  }

  test("serving searchLtr: bit-identical to the dataflow featuresDF + rerankDF chain") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "r", "en"),
      (2L, "alpha alpha alpha", "r", "en"),
      (3L, "beta beta delta epsilon zeta eta", "r", "en"),
      (4L, "gamma delta", "r", "en"),
      (5L, "alpha beta", "r", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-ltr").toString
    graft.index.SegmentIndex.build(docs, dir, buckets = 2)
    val meta = graft.index.SegmentIndex.readMeta(dir)
    val segs = graft.index.SegmentIndex.segmentFiles(dir)
      .map(graft.index.SegmentIndex.loadSegment(_)).toIndexedSeq
    val servingEng = new SegmentSearch.ServingEngine(segs, meta)
    val w = Ltr.Weights(3, 2000000, -500, 40000, 70000)
    val served = servingEng.searchLtr("alpha beta", w, 3)
    val dataflow = Ltr.rerankDF(Ltr.featuresDF(eng, "alpha beta"), w, 3).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(served == dataflow, s"served=$served dataflow=$dataflow")
    // empty / absent-term queries degrade like search()
    assert(servingEng.searchLtr("", w, 3).isEmpty)
    assert(servingEng.searchLtr("zzznotaword", w, 3).isEmpty)
  }

  test("fit on real features: trained integer model ranks a relevance label better than raw BM25") {
    // labels: coverage-dominated relevance (a doc matching both terms is
    // better regardless of tf) — BM25 alone mis-ranks doc 2 above doc 5
    val feats = Ltr.featuresDF(eng, "alpha beta")
      .withColumn("label", col("f_matched").cast("double") * 10.0 - col("f_dl").cast("double") * 0.1)
    val (_, w) = Ltr.fit(feats, Ltr.FeatureCols, "label", lambda = 1e-3)
    // quantize to integer micro weights — the serving discipline
    val qw = Ltr.Weights(
      math.round(w(0) * 1e6), math.round(w(1) * 1e6), math.round(w(2) * 1e6),
      math.round(w(3) * 1e6), math.round(w(4) * 1e6))
    val ranked = Ltr.rerankDF(feats, qw, 10).collect().map(_.getLong(1)).toSeq
    val byLabel = feats.orderBy(col("label").desc, col("doc_id").asc).collect().map(_.getLong(0)).toSeq
    assert(ranked == byLabel, s"ranked=$ranked byLabel=$byLabel")
  }
}
