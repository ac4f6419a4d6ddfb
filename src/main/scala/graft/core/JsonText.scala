package graft.core

/** Minimal JSON string escaping shared by every JSON-emitting surface (CLI,
  * HTTP server) — one implementation so escaping fixes can't diverge.
  */
object JsonText {
  /** Append `s` escaped into `sb` — the serving hot path builds a whole
    * response into ONE builder instead of allocating a string per field
    * (the old flatMap escape also allocated a String per CHARACTER).
    */
  def escInto(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') sb.append("\\\"")
      else if (c == '\\') sb.append("\\\\")
      else if (c == '\n') sb.append("\\n")
      else if (c < ' ') sb.append(f"\\u${c.toInt}%04x")
      else sb.append(c)
      i += 1
    }
  }

  def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    escInto(sb, s)
    sb.toString
  }
}
