package graft.core

/** Phrase-adjacency matcher — an EXTENSION beyond the reference engine.
  *
  * Phrase / proximity queries are an explicit deferred non-goal of the
  * reference's ranking phase
  * (/root/reference/specs/phase3_ranking_query_engine.md:66 — "Phrase
  * queries, proximity, or wildcard/fuzzy matching (deferred to a later
  * phase)"). This module delivers that later phase for the Spark engine
  * WITHOUT changing the reference-exact query language: phrase search is a
  * separate entry point (`SearchEngine.phraseScoredDF`), never reachable
  * from `QueryParser.parse`, so every reference query keeps its pinned
  * semantics.
  *
  * Matching semantics: a document matches the phrase iff its reference token
  * stream (`Tokenizer.tokenize` — the same anchor used at index time)
  * contains the phrase's token sequence consecutively. Separator bytes
  * between the tokens are irrelevant ("stream-table HASH!" matches
  * "stream table hash"); token boundaries are exactly the tokenizer's.
  *
  * The scan is single-pass over the text with a circular window of the last
  * m tokens — no token list is materialized, so verifying a candidate is
  * O(len(text)) time and O(m) space regardless of document size.
  */
object Phrase extends Serializable {

  /** True iff `terms` (already tokenizer-normalized, non-empty) occur
    * consecutively in `text`'s token stream.
    */
  def containsPhrase(text: String, terms: IndexedSeq[String]): Boolean = {
    val m = terms.length
    if (m == 0 || text == null) return false
    val win = new Array[String](m) // circular buffer of the last m tokens
    var seen = 0 // tokens emitted so far
    val cur = new java.lang.StringBuilder

    // Compare the window [seen-m, seen) against the phrase; called when a
    // token ends. Overlapping / repeated-prefix phrases ("a a b" in
    // "a a a b") need no restart logic — every window position is checked.
    @inline def windowMatches(): Boolean = {
      var j = 0
      while (j < m) {
        if (win((seen - m + j) % m) != terms(j)) return false
        j += 1
      }
      true
    }

    @inline def flush(): Boolean = {
      if (cur.length() == 0) false
      else {
        win(seen % m) = cur.toString
        cur.setLength(0)
        seen += 1
        seen >= m && windowMatches()
      }
    }

    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Tokenizer.isAsciiAlnum(c)) cur.append(Tokenizer.asciiLower(c))
      else if (flush()) return true
      i += 1
    }
    flush()
  }
}
