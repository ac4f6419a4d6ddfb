package graft.search

import graft.SparkTestBase
import graft.core.EditDistance

/** SymSpell deletion-neighborhood index: exhaustive equivalence with the
  * brute vocabulary scan, and serving-tier behavioral parity on the fuzzy
  * family it accelerates.
  */
class SymSpellSpec extends SparkTestBase {

  private def randomVocab(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcd"
    (0 until n).map { _ =>
      val len = 1 + rnd.nextInt(6)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
  }

  test("neighbors == brute lev<=1 scan, exhaustively over a dense small-alphabet vocab") {
    val vocab = randomVocab(600, seed = 11)
    val ss = SymSpell.build(vocab.iterator ++ vocab.iterator) // dup input: build dedups
    val probes = vocab.take(120) ++ Seq("", "a", "abcd", "dddd", "abcde", "zzz", "abcdabc")
    probes.foreach { q =>
      val brute = vocab.filter(c => EditDistance.within(c, q, 1)).sorted
      assert(ss.neighbors(q) == brute, s"probe '$q'")
    }
  }

  test("false deletion-form candidates are verified away (transpositions are distance 2)") {
    // "ab" and "ba" share deletion forms {a, b} but lev("ab","ba") = 2
    val ss = SymSpell.build(Iterator("ba"))
    assert(ss.neighbors("ab").isEmpty)
    assert(ss.neighbors("ba") == Seq("ba"))
    assert(ss.neighbors("b") == Seq("ba")) // real distance-1 neighbor
  }

  test("serving fuzzy/did-you-mean ride the neighborhood and match the dist-2 scan family") {
    val docs = (1L to 60L).map { i =>
      i -> (i % 4 match {
        case 0 => "alpha beta gamma"
        case 1 => "alphx beta"
        case 2 => "alpha delta"
        case _ => "gamma gammz"
      })
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-symspell").toString
    graft.index.SegmentIndex.build(docsDF(docs), dir, buckets = 3)
    val meta = graft.index.SegmentIndex.readMeta(dir)
    val segs = graft.index.SegmentIndex.liveSegmentFiles(dir, meta)
      .map(graft.index.SegmentIndex.loadSegment(_)).toIndexedSeq
    val eng = new SegmentSearch.ServingEngine(segs, meta)

    // dist-1 (SymSpell path) vs the same expansion computed by hand
    val vocab = segs.flatMap(_.terms.keys).distinct
    Seq("alpha", "alphz", "gamm", "beta", "qqqq").foreach { q =>
      val expect = vocab.filter(c => EditDistance.within(c, q, 1)).sorted
      val viaSearch = eng.searchFuzzy(q, 100)
      val viaExplicit =
        if (expect.isEmpty) Nil
        else eng.search(graft.core.ParsedQuery(expect, Nil, isOr = true), 100)
      assert(viaSearch == viaExplicit, s"fuzzy '$q'")
    }

    // did-you-mean: exact presence wins; else argmax df tie byte-lex; else itself
    // 'alphz' is lev-1 of both 'alpha' (df 30) and 'alphx' (df 15): argmax df
    val dym = eng.didYouMean("alpha alphz qqqq")
    assert(dym.map(x => (x._2, x._3)) == Seq(
      ("alpha", "alpha"), ("alphz", "alpha"), ("qqqq", "qqqq")), dym.toString)
    // df ties break byte-lex: 'gammz' (df 15) vs 'gamma' (df 30) -> for
    // 'gammy' argmax is 'gamma'; for a probe equidistant from two df-15
    // terms the smaller term wins
    assert(eng.didYouMean("gammy").map(x => (x._2, x._3)) == Seq(("gammy", "gamma")))

    // dist-2 falls back to the scan path and stays consistent with brute
    val brute2 = vocab.filter(c => EditDistance.within(c, "alp", 2)).sorted
    val via2 = eng.searchFuzzy("alp", 100, maxDist = 2)
    val explicit2 =
      if (brute2.isEmpty) Nil else eng.search(graft.core.ParsedQuery(brute2, Nil, isOr = true), 100)
    assert(via2 == explicit2)
  }

  test("depth-2 neighborhood == brute lev<=2 scan, exhaustively (r6 opt-in depth)") {
    val vocab = randomVocab(400, seed = 23)
    val ss = SymSpell.build(vocab.iterator, depth = 2)
    val probes = vocab.take(80) ++ Seq("", "a", "ab", "abcd", "dddd", "abcde", "zzz", "dcba")
    probes.foreach { q =>
      val brute1 = vocab.filter(c => EditDistance.within(c, q, 1)).sorted
      val brute2 = vocab.filter(c => EditDistance.within(c, q, 2)).sorted
      assert(ss.neighbors(q, 1) == brute1, s"probe '$q' d=1")
      assert(ss.neighbors(q, 2) == brute2, s"probe '$q' d=2")
    }
  }

  test("serving engine at symspellDepth=2 answers maxDist=2 identically to the scan engine") {
    val docs = (1L to 40L).map { i =>
      i -> (i % 3 match {
        case 0 => "alpha beta gamma"
        case 1 => "alpbx beta"
        case _ => "gamma delta"
      })
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-symspell2").toString
    graft.index.SegmentIndex.build(docsDF(docs), dir, buckets = 2)
    val meta = graft.index.SegmentIndex.readMeta(dir)
    val segs = graft.index.SegmentIndex.liveSegmentFiles(dir, meta)
      .map(graft.index.SegmentIndex.loadSegment(_)).toIndexedSeq
    val deep = new SegmentSearch.ServingEngine(segs, meta, symspellDepth = 2)
    val scan = new SegmentSearch.ServingEngine(segs, meta, symspellDepth = 1)
    Seq("alpha", "alp", "alpb", "gamm", "qq", "bexa").foreach { q =>
      assert(deep.searchFuzzy(q, 50, maxDist = 2) == scan.searchFuzzy(q, 50, maxDist = 2),
        s"fuzzy d2 '$q'")
      assert(deep.didYouMean(q, maxDist = 2) == scan.didYouMean(q, maxDist = 2),
        s"dym d2 '$q'")
      // depth-2 index still answers d=1 exactly
      assert(deep.searchFuzzy(q, 50, maxDist = 1) == scan.searchFuzzy(q, 50, maxDist = 1),
        s"fuzzy d1 '$q'")
    }
  }
}
