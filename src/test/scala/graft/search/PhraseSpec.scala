package graft.search

import graft.SparkTestBase
import graft.core.{Phrase, Tokenizer}
import graft.index.IndexBuilder

class PhraseSpec extends SparkTestBase {

  private def terms(s: String) = Tokenizer.tokenize(s).toIndexedSeq

  test("containsPhrase: adjacency over the reference token stream") {
    assert(Phrase.containsPhrase("stream table hash join", terms("stream table hash")))
    assert(Phrase.containsPhrase("x stream table hash", terms("stream table hash")))
    assert(Phrase.containsPhrase("stream table hash", terms("stream table hash")))
    // separators and case are the tokenizer's business, not the matcher's
    assert(Phrase.containsPhrase("Stream-Table\tHASH!", terms("stream table hash")))
    // present but not adjacent
    assert(!Phrase.containsPhrase("stream x table hash", terms("stream table hash")))
    assert(!Phrase.containsPhrase("table hash stream", terms("stream table hash")))
    // token-boundary discipline: substrings of longer tokens do not match
    assert(!Phrase.containsPhrase("streams table hash", terms("stream table hash")))
    assert(!Phrase.containsPhrase("stream tablehash", terms("stream table hash")))
  }

  test("containsPhrase: repeated-prefix phrases need no restart logic") {
    assert(Phrase.containsPhrase("a a a b", terms("a a b")))
    assert(Phrase.containsPhrase("a c a b", terms("a b")))
    assert(!Phrase.containsPhrase("a c b", terms("a b")))
    assert(Phrase.containsPhrase("a a", terms("a a")))
    assert(!Phrase.containsPhrase("a b a", terms("a a")))
  }

  test("containsPhrase: degenerate inputs") {
    assert(!Phrase.containsPhrase("anything", Vector.empty))
    assert(!Phrase.containsPhrase(null, terms("a")))
    assert(!Phrase.containsPhrase("", terms("a")))
    assert(!Phrase.containsPhrase("a b", terms("a b c"))) // phrase longer than doc
    assert(Phrase.containsPhrase("solo", terms("solo"))) // single-term phrase
  }

  test("phraseScoredDF: filters AND candidates to adjacent ones, score parity") {
    val eng = new SearchEngine(IndexBuilder.build(docsDF(Seq(
      1L -> "alpha bravo charlie", // adjacent
      2L -> "bravo alpha x charlie", // all terms, not adjacent
      3L -> "alpha bravo", // missing charlie
      4L -> "alpha bravo charlie alpha" // adjacent with extra occurrence
    ))).cache())
    val got = eng.phraseScoredDF("alpha bravo charlie").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 4L))
    // the phrase only filters: score == AND score of the same terms
    val andScores = eng.scoredDF("alpha bravo charlie").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, s) => assert(s == andScores(id)) }
  }

  test("searchPhraseWithSnippets: ranked, decorated, phrase-filtered") {
    val eng = new SearchEngine(IndexBuilder.build(docsDF(Seq(
      1L -> "alpha bravo charlie tail words here",
      2L -> "bravo alpha x charlie",
      3L -> "alpha bravo charlie and more alpha"
    ))).cache())
    val hits = eng.searchPhraseWithSnippets("alpha bravo charlie", k = 10)
    assert(hits.map(_.docId).toSet == Set(1L, 3L))
    // ranked: scores descending under the epsilon rule
    assert(hits.sliding(2).forall {
      case Seq(a, b) => a.score >= b.score - 1e-9
      case _ => true
    })
    assert(hits.forall(_.snippet.contains("alpha")))
  }

  test("prefixScoredDF: dictionary expansion, OR semantics, empty prefix") {
    val eng = new SearchEngine(IndexBuilder.build(docsDF(Seq(
      1L -> "scan sort",
      2L -> "scan merge",
      3L -> "merge join"
    ))).cache())
    val got = eng.prefixScoredDF("s").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // scan/sort match 's%'; doc 3 has neither
    assert(eng.prefixScoredDF("zz").collect().isEmpty)
    // multi-token input is not a prefix — defined empty
    assert(eng.prefixScoredDF("a b").collect().isEmpty)
    // prefix scoring = OR scoring over the expanded terms (byte-lex order)
    val or = eng.scoredDF("scan OR sort").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pf = eng.prefixScoredDF("s").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pf == or)
  }
}
