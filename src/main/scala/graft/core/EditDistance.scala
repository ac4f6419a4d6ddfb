package graft.core

/** Bounded Levenshtein distance for typo-tolerant term expansion — an
  * EXTENSION beyond the reference (the reference's own product survey marks
  * typo tolerance as a gap vs Meilisearch/Typesense,
  * /root/reference/COMMERCIAL_ROADMAP.md:31 "Typo tolerance / fuzzy ❌").
  *
  * Semantics: plain unit-cost Levenshtein (insert / delete / substitute, no
  * transposition) — the same function DuckDB exposes as `levenshtein(a, b)`,
  * which is what the oracle gate uses.
  *
  * `within` is the hot path (dictionary scan): banded DP over two rolling
  * rows, O(|a| * (2*maxDist+1)) time, with a length pre-check and an
  * early-exit when a full band exceeds the bound.
  */
object EditDistance {

  /** True iff levenshtein(a, b) <= maxDist. */
  def within(a: String, b: String, maxDist: Int): Boolean = {
    if (maxDist < 0) return false
    val la = a.length
    val lb = b.length
    if (math.abs(la - lb) > maxDist) return false
    if (maxDist == 0) return a == b
    dist(a, b, maxDist) <= maxDist
  }

  /** Exact distance (for tests / callers that need the value). */
  def dist(a: String, b: String): Int = dist(a, b, math.max(a.length, b.length))

  /** Banded DP: cells with |i - j| > bound can never contribute to a result
    * <= bound, so only the 2*bound+1 diagonal band is computed; out-of-band
    * cells are treated as bound+1. Returns a value > bound when the true
    * distance exceeds the bound (exact value not guaranteed past it).
    */
  private def dist(a: String, b: String, bound: Int): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val big = bound + 1
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= bound) j else big; j += 1 }
    var i = 1
    while (i <= la) {
      val lo = math.max(1, i - bound)
      val hi = math.min(lb, i + bound)
      cur(lo - 1) = if (i - (lo - 1) <= bound && lo - 1 == 0) i else big
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > big) v = big
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < lb) cur(hi + 1) = big
      if (rowMin > bound) return big
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(lb)
  }
}
