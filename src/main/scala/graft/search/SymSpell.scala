package graft.search

import graft.core.EditDistance

/** SymSpell-style deletion-neighborhood index for unit-cost Levenshtein <= 1
  * term lookup — the 100 TB serving shape SURVEY §2.14 names: the per-request
  * cost of fuzzy expansion / did-you-mean becomes O(|term|) hash probes plus
  * the (tiny) verified candidate set, instead of an O(vocabulary) dictionary
  * scan per request.
  *
  * Completeness (why one deletion depth is exact for distance <= 1): for any
  * vocab term t with lev(q, t) <= 1, q and t share a common string in their
  * deletion-1 neighborhoods — equality (0/0 deletions), substitution at i
  * (delete i from both), insertion in t (delete it: t-1 == q), deletion from
  * q (q-1 == t). The index can also return FALSE candidates that share a
  * deletion form at distance 2 (e.g. "ab"/"ba"), so [[neighbors]] verifies
  * every candidate with the real DP before returning — the neighborhood is
  * a superset filter, never the answer itself.
  *
  * Memory: ~vocab x (avgLen + 1) map entries of interned term references —
  * the classic SymSpell space-for-time trade, paid once per serving
  * generation (and only when a fuzzy-family request arrives: callers hold it
  * in a lazy val).
  */
final class SymSpell private (index: java.util.HashMap[String, Array[String]]) {

  /** All vocabulary terms within unit-cost Levenshtein <= 1 of `t`,
    * byte-lex sorted (the expansion order the scorer requires). Includes
    * `t` itself when in vocabulary.
    */
  def neighbors(t: String): Seq[String] = {
    val seen = new scala.collection.mutable.HashSet[String]()
    SymSpell.variants(t).foreach { v =>
      val arr = index.get(v)
      if (arr != null) {
        var i = 0
        while (i < arr.length) { seen += arr(i); i += 1 }
      }
    }
    seen.iterator.filter(c => EditDistance.within(c, t, 1)).toSeq.sorted
  }

  def entryCount: Int = index.size()
}

object SymSpell {

  /** `t` plus every single-character deletion of `t`. */
  private[search] def variants(t: String): Seq[String] =
    t +: (0 until t.length).map(i => t.substring(0, i) + t.substring(i + 1))

  /** Build from a (possibly duplicate-bearing) vocabulary iterator —
    * per-segment dictionaries repeat shared terms; they are deduped here.
    */
  def build(vocab: Iterator[String]): SymSpell = {
    val seen = new java.util.HashSet[String]()
    val acc = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
    vocab.foreach { term =>
      if (seen.add(term)) {
        variants(term).foreach { v =>
          var buf = acc.get(v)
          if (buf == null) { buf = new scala.collection.mutable.ArrayBuffer[String](2); acc.put(v, buf) }
          buf += term
        }
      }
    }
    val frozen = new java.util.HashMap[String, Array[String]](acc.size() * 2)
    acc.forEach((k, v) => frozen.put(k, v.toArray))
    new SymSpell(frozen)
  }
}
