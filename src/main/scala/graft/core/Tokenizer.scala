package graft.core

import scala.collection.mutable.ArrayBuffer

/** Tokenizer — THE semantics anchor of the engine.
  *
  * Reference semantics (/root/reference/src/core/tokenizer.cpp:3-25): byte-wise
  * scan; ASCII alphanumeric bytes are kept (lowercased via ASCII tolower),
  * every other byte flushes the current token. C-locale `isalnum` is ASCII-only,
  * so UTF-8 multibyte characters are always separators. The same function runs
  * at index time and query time (parity required by
  * /root/reference/specs/phase3_ranking_query_engine.md:199-202).
  *
  * `codeTokens` is the north-rule extension mode (code-aware identifier
  * splitting + case folding): camelCase / snake_case / digit boundaries are
  * additionally split, and the original reference tokens are preserved so
  * reference-mode queries keep matching.
  */
object Tokenizer extends Serializable {

  @inline private[core] def isAsciiAlnum(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private[core] def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Reference-mode tokenization: split on every non-ASCII-alnum char, ASCII
    * lowercase. Operates on Java chars; for ASCII input this is byte-identical
    * to the reference. Non-ASCII chars are separators in both (C-locale
    * isalnum(byte) is false for all bytes >= 0x80 in the reference; any
    * non-ASCII java char is a separator here — same token stream for any
    * input whose alnum runs are pure ASCII, which the contract pins).
    */
  def tokenize(text: String): Seq[String] = {
    if (text == null) return Nil
    val out = new ArrayBuffer[String]()
    val cur = new java.lang.StringBuilder()
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (isAsciiAlnum(c)) cur.append(asciiLower(c))
      else if (cur.length() > 0) { out += cur.toString; cur.setLength(0) }
      i += 1
    }
    if (cur.length() > 0) out += cur.toString
    out.toSeq
  }

  /** Code-aware mode (north_rule extension): reference tokens PLUS identifier
    * sub-tokens from camelCase / snake_case / digit-boundary splitting, all
    * case-folded. "parseHTTPRequest2" -> reference token "parsehttprequest2"
    * plus sub-tokens "parse","http","request","2".
    */
  def codeTokens(text: String): Seq[String] = {
    if (text == null) return Nil
    val base = rawIdentifiers(text)
    val out = new ArrayBuffer[String](base.length * 2)
    base.foreach { ident =>
      val lower = ident.map(asciiLower)
      out += lower
      val subs = splitIdentifier(ident)
      if (subs.lengthCompare(1) > 0 || (subs.nonEmpty && subs.head != lower))
        out ++= subs
    }
    out.toSeq
  }

  /** Like tokenize but preserves case (needed for camelCase boundaries). */
  private def rawIdentifiers(text: String): Seq[String] = {
    val out = new ArrayBuffer[String]()
    val cur = new java.lang.StringBuilder()
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (isAsciiAlnum(c)) cur.append(c)
      else if (cur.length() > 0) { out += cur.toString; cur.setLength(0) }
      i += 1
    }
    if (cur.length() > 0) out += cur.toString
    out.toSeq
  }

  /** Split one identifier at case and digit boundaries, lowercase the parts.
    * Boundaries: lower->Upper ("fooBar"), Upper+Upper->Upper+lower ("HTTPServer"
    * -> HTTP, Server), alpha<->digit.
    */
  def splitIdentifier(ident: String): Seq[String] = {
    if (ident.isEmpty) return Nil
    val out = new ArrayBuffer[String]()
    val cur = new java.lang.StringBuilder()
    @inline def isUp(c: Char) = c >= 'A' && c <= 'Z'
    @inline def isLo(c: Char) = c >= 'a' && c <= 'z'
    @inline def isDig(c: Char) = c >= '0' && c <= '9'
    var i = 0
    val n = ident.length
    var p = '\u0000' // previous ORIGINAL (un-lowercased) char
    while (i < n) {
      val c = ident.charAt(i)
      if (cur.length() > 0) {
        val boundary =
          (isLo(p) && isUp(c)) ||
            (isDig(p) && !isDig(c)) ||
            (!isDig(p) && isDig(c)) ||
            (isUp(p) && isUp(c) && i + 1 < n && isLo(ident.charAt(i + 1)))
        if (boundary) { out += cur.toString; cur.setLength(0) }
      }
      cur.append(asciiLower(c))
      p = c
      i += 1
    }
    if (cur.length() > 0) out += cur.toString
    out.toSeq
  }
}
