package graft.core

/** Snippet generation (/root/reference/src/core/snippet.cpp:12-34).
  *
  * Lowercase copy of the doc text; earliest SUBSTRING occurrence of any
  * (lowercased) query term; window of `windowChars` starting at
  * `pos - windowChars/3` clamped to 0 (pos <= window/3 -> 0); fallback is the
  * first `windowChars` chars when no term occurs. Substring search on raw
  * text, NOT on token boundaries.
  */
object Snippets extends Serializable {
  val DefaultWindow = 120

  @inline private def fold(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** `asciiLower(text).indexOf(asciiLower(term))` without materializing the
    * lowercase copies — ASCII folding is 1:1 per char, so folding on the fly
    * is position-identical; the serving path calls this per hit and the full
    * text copy was pure allocation churn.
    */
  private def indexOfFolded(text: String, term: String): Int = {
    val m = term.length
    if (m == 0) return 0 // String.indexOf("") semantics
    val last = text.length - m
    if (last < 0) return -1
    val first = fold(term.charAt(0))
    var i = 0
    while (i <= last) {
      if (fold(text.charAt(i)) == first) {
        var j = 1
        while (j < m && fold(text.charAt(i + j)) == fold(term.charAt(j))) j += 1
        if (j == m) return i
      }
      i += 1
    }
    -1
  }

  def makeSnippet(text: String, terms: Seq[String], windowChars: Int = DefaultWindow): String = {
    if (text == null) return ""
    var best = -1
    terms.foreach { t =>
      val pos = indexOfFolded(text, t)
      if (pos >= 0 && (best < 0 || pos < best)) best = pos
    }
    if (best < 0) return text.substring(0, math.min(windowChars, text.length))
    val start = if (best > windowChars / 3) best - windowChars / 3 else 0
    val end = math.min(start + windowChars, text.length)
    text.substring(start, end)
  }
}
