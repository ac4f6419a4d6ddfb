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

  private def asciiLower(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    b.toString
  }

  def makeSnippet(text: String, terms: Seq[String], windowChars: Int = DefaultWindow): String = {
    if (text == null) return ""
    val ltext = asciiLower(text)
    var best = -1
    terms.foreach { t =>
      val pos = ltext.indexOf(asciiLower(t))
      if (pos >= 0 && (best < 0 || pos < best)) best = pos
    }
    if (best < 0) return text.substring(0, math.min(windowChars, text.length))
    val start = if (best > windowChars / 3) best - windowChars / 3 else 0
    val end = math.min(start + windowChars, text.length)
    text.substring(start, end)
  }
}
