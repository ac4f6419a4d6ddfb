package graft.core

/** '*'-only glob over index terms — the reference's LAST deferred query
  * feature ("phrase/wildcard", /root/reference/specs/
  * phase3_ranking_query_engine.md:66; phrase and prefix shipped earlier,
  * this generalizes prefix to `*bar` / `foo*bar`).
  *
  * Semantics anchor: index terms are pure ASCII-alnum runs (Tokenizer F1/F3),
  * so a valid pattern is alnum chunks separated by `*`, ASCII-lowercased
  * like any query term. Because terms can never contain `_` or `%`, the SQL
  * twin is exactly `term LIKE replace(pattern,'*','%')` — the dataflow tier
  * pushes that predicate into the dictionary scan, the serving tier runs
  * [[matches]] over per-segment dictionaries; both expand to the same term
  * set and score it OR-mode in byte-lex order (the prefix discipline).
  */
object Glob {

  /** Normalize a wildcard pattern under tokenizer semantics: ASCII-lowercase,
    * every non-`*` char must be ASCII alnum, runs of `*` collapse to one.
    * None = not answerable (empty-result discipline, like a multi-token
    * prefix); a pattern without `*` stays valid (degenerates to an exact
    * dictionary lookup).
    */
  def normalize(pattern: String): Option[String] = {
    if (pattern == null) return None
    val p = pattern.trim
    if (p.isEmpty) return None
    val sb = new java.lang.StringBuilder(p.length)
    var i = 0
    while (i < p.length) {
      val c = Tokenizer.asciiLower(p.charAt(i))
      if (c == '*') { if (sb.length() == 0 || sb.charAt(sb.length() - 1) != '*') sb.append(c) }
      else if (Tokenizer.isAsciiAlnum(c)) sb.append(c)
      else return None
      i += 1
    }
    Some(sb.toString)
  }

  /** SQL LIKE twin of a normalized pattern (terms never contain `_`/`%`,
    * so no escaping is needed — see object doc).
    */
  def toLike(normalized: String): String = normalized.replace('*', '%')

  /** Greedy two-pointer `*`-glob match, linear in |s| for patterns whose
    * stars were collapsed by [[normalize]] (amortized backtracking).
    */
  def matches(pattern: String, s: String): Boolean = {
    var p = 0
    var i = 0
    var star = -1
    var mark = 0
    val pn = pattern.length
    val sn = s.length
    while (i < sn) {
      if (p < pn && pattern.charAt(p) == s.charAt(i)) { p += 1; i += 1 }
      else if (p < pn && pattern.charAt(p) == '*') { star = p; p += 1; mark = i }
      else if (star >= 0) { p = star + 1; mark += 1; i = mark }
      else return false
    }
    while (p < pn && pattern.charAt(p) == '*') p += 1
    p == pn
  }
}
