package graft.search

import graft.core.EditDistance

/** SymSpell-style deletion-neighborhood index for unit-cost Levenshtein <= d
  * term lookup — the 100 TB serving shape SURVEY §2.14 names: the per-request
  * cost of fuzzy expansion / did-you-mean becomes O(|term|^d) hash probes
  * plus the (tiny) verified candidate set, instead of an O(vocabulary)
  * dictionary scan per request.
  *
  * Completeness (why deletion depth d is exact for distance <= d): every
  * unit-cost edit script of length <= d from q to t can be decomposed so
  * that deleting <= d characters from q and <= d characters from t reach a
  * common string (substitutions delete one from each side, insertions/
  * deletions delete one from one side) — so the depth-d deletion
  * neighborhoods of q and t intersect. The index can also return FALSE
  * candidates that only share a deep deletion form, so [[neighbors]]
  * verifies every candidate with the real DP before returning — the
  * neighborhood is a superset filter, never the answer itself.
  *
  * Memory: ~vocab x C(len, <=depth) map entries of interned term references
  * — the classic SymSpell space-for-time trade, paid once per serving
  * generation (and only when a fuzzy-family request arrives: callers hold it
  * in a lazy val). Depth 1 costs ~(len+1) entries/term; depth 2 (r6,
  * opt-in per generation — VERDICT r5 #5) ~(1 + len + len(len-1)/2)
  * entries/term, i.e. ~5-6x depth 1 at typical term lengths — the price of
  * answering `maxDist = 2` requests without a vocabulary scan.
  */
final class SymSpell private (index: java.util.HashMap[String, Array[String]], val depth: Int) {

  /** All vocabulary terms within unit-cost Levenshtein <= maxDist of `t`,
    * byte-lex sorted (the expansion order the scorer requires). Includes
    * `t` itself when in vocabulary. `maxDist` must be <= the depth the
    * index was built with (callers branch to the scan fallback otherwise).
    */
  def neighbors(t: String, maxDist: Int = 1): Seq[String] = {
    require(maxDist <= depth,
      s"SymSpell index built at depth $depth cannot answer maxDist=$maxDist")
    val seen = new scala.collection.mutable.HashSet[String]()
    SymSpell.variants(t, maxDist).foreach { v =>
      val arr = index.get(v)
      if (arr != null) {
        var i = 0
        while (i < arr.length) { seen += arr(i); i += 1 }
      }
    }
    seen.iterator.filter(c => EditDistance.within(c, t, maxDist)).toSeq.sorted
  }

  def entryCount: Int = index.size()
}

object SymSpell {

  /** `t` plus every way of deleting up to `depth` characters from `t`,
    * deduped. Depth 1 = the round-5 neighborhood; depth 2 adds the
    * two-deletion forms.
    */
  private[search] def variants(t: String, depth: Int): collection.Set[String] = {
    val out = new scala.collection.mutable.HashSet[String]()
    def rec(s: String, d: Int): Unit = {
      if (out.add(s) && d > 0) {
        var i = 0
        while (i < s.length) {
          rec(s.substring(0, i) + s.substring(i + 1), d - 1)
          i += 1
        }
      }
    }
    rec(t, depth)
    out
  }

  /** Backward-compatible depth-1 variant list (tests reference it). */
  private[search] def variants(t: String): Seq[String] =
    t +: (0 until t.length).map(i => t.substring(0, i) + t.substring(i + 1))

  /** Build from a (possibly duplicate-bearing) vocabulary iterator —
    * per-segment dictionaries repeat shared terms; they are deduped here.
    */
  def build(vocab: Iterator[String], depth: Int = 1): SymSpell = {
    require(depth >= 1 && depth <= 2, s"supported depths: 1, 2 (got $depth)")
    val seen = new java.util.HashSet[String]()
    val acc = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
    vocab.foreach { term =>
      if (seen.add(term)) {
        variants(term, depth).foreach { v =>
          var buf = acc.get(v)
          if (buf == null) { buf = new scala.collection.mutable.ArrayBuffer[String](2); acc.put(v, buf) }
          buf += term
        }
      }
    }
    val frozen = new java.util.HashMap[String, Array[String]](acc.size() * 2)
    acc.forEach((k, v) => frozen.put(k, v.toArray))
    new SymSpell(frozen, depth)
  }
}
