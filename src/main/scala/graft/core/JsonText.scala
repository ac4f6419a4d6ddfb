package graft.core

/** Minimal JSON string escaping shared by every JSON-emitting surface (CLI,
  * HTTP server) — one implementation so escaping fixes can't diverge.
  */
object JsonText {
  def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
