package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven properties (FIXTURES.md §7) over the PURE core — the
  * Spark paths are separately property-tested against RefEngine (which these
  * properties pin down).
  */
class PropertySpec extends AnyFunSuite {

  /** seeded forAll driver (scalatestplus bridge is not in the offline cache) */
  private def forAll[A](g: Gen[A], trials: Int = 120)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < trials) {
      g.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => body(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(body: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => body(t._1, t._2, t._3))


  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ' ', '-', '.', ',', '\t', '_', '!'),
      1 -> Gen.oneOf('é', 'ß', '中') // non-ASCII must always split
    )).map(_.mkString)

  test("property: JSON escInto round-trips through a JSON parser and matches esc") {
    val anyText: Gen[String] = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf('"', '\\', '\n', '\t', '\r', ' ', 'é', '中'),
      1 -> Gen.choose(0.toChar, 31.toChar)
    )).map(_.mkString)
    forAll(anyText) { s =>
      val sb = new java.lang.StringBuilder
      JsonText.escInto(sb, s)
      assert(sb.toString == JsonText.esc(s)) // the two surfaces can't diverge
      // what the server emits must decode back to the original string
      val parsed = org.json4s.jackson.JsonMethods.parse(s""""${sb.toString}"""")
      assert(parsed.values == s, s"escape not parseable/lossless for ${s.map(_.toInt)}")
    }
  }

  test("property: tokenizer ≡ model spec (split [^0-9A-Za-z]+, ASCII lowercase)") {
    forAll(asciiText) { s =>
      val model = s.split("[^0-9A-Za-z]+").filter(_.nonEmpty)
        .map(_.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)).toSeq
      assert(Tokenizer.tokenize(s) == model)
    }
  }

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "q7")
  private val corpusGen: Gen[Seq[(Long, String)]] =
    Gen.chooseNum(1, 30).flatMap { n =>
      Gen.sequence[Seq[(Long, String)], (Long, String)]((1 to n).map { id =>
        Gen.chooseNum(0, 15).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf(vocab)).map(ws => (id.toLong, ws.mkString(" "))))
      })
    }
  private val termGen: Gen[String] = Gen.oneOf(vocab)

  private def engine(corpus: Seq[(Long, String)]): RefEngine = {
    val e = new RefEngine
    corpus.foreach { case (id, t) => e.addDocument(id, t) }
    e
  }

  test("property: AND ⊆ each term's postings and AND ⊆ OR") {
    forAll(corpusGen, termGen, termGen) { (corpus, a, b) =>
      val e = engine(corpus)
      val andIds = e.searchScored(s"$a $b").map(_._1).toSet
      val orIds = e.searchScored(s"$a OR $b").map(_._1).toSet
      assert(andIds.subsetOf(e.postings(a).toSet))
      assert(andIds.subsetOf(e.postings(b).toSet))
      assert(andIds.subsetOf(orIds))
      assert(orIds == (e.postings(a).toSet ++ e.postings(b).toSet))
    }
  }

  test("property: NOT results disjoint from NOT-term postings; NOT never changes scores") {
    forAll(corpusGen, termGen, termGen) { (corpus, a, b) =>
      val e = engine(corpus)
      val withNot = e.searchScored(s"$a -$b")
      assert(withNot.map(_._1).toSet.intersect(e.postings(b).toSet).isEmpty)
      val without = e.searchScored(a).toMap
      withNot.foreach { case (id, s) => assert(s == without(id)) }
    }
  }

  test("property: top-k is a prefix of top-k' for k < k'") {
    forAll(corpusGen, termGen) { (corpus, a) =>
      val e = engine(corpus)
      val full = e.searchScored(a)
      for (k <- Seq(1, 2, 5)) {
        // tie-break is deterministic, so the prefix property is exact
        assert(full.take(k) == full.take(math.min(k, full.size)))
      }
    }
  }

  test("property: duplicate query term scores exactly double (2x is exact in fp)") {
    forAll(corpusGen, termGen) { (corpus, a) =>
      val e = engine(corpus)
      val once = e.searchScored(a).toMap
      e.searchScored(s"$a $a").foreach { case (id, s) =>
        assert(s == 2 * once(id))
      }
    }
  }

  test("property: containsPhrase ≡ sliding-window model over the token stream") {
    // small alphabet forces repeats and overlapping near-matches — the
    // circular-window matcher's hard cases
    val tok = Gen.oneOf("a", "b", "ab", "c")
    val doc: Gen[List[String]] = Gen.listOfN(12, tok).flatMap(l => Gen.choose(0, 12).map(l.take))
    val phrase: Gen[List[String]] = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, tok))
    val sep = Gen.oneOf(" ", "-", ".", "\t", "--", " é ")
    forAll(Gen.zip(doc, phrase, sep), trials = 400) { case (d, p, s) =>
      val text = d.mkString(s)
      val model = d.sliding(p.length).contains(p) && d.length >= p.length
      val got = Phrase.containsPhrase(text, p.toIndexedSeq)
      assert(got == model, s"doc=$d phrase=$p sep='$s' got=$got model=$model")
    }
  }
}
