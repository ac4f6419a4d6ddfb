package graft.core

/** Flat parsed query — no AST, no precedence, mirroring the reference's query
  * language (/root/reference/src/core/query_parser.h:6-11).
  *
  * `terms` may contain duplicates — duplicate query terms are scored once per
  * occurrence (/root/reference/src/core/search_service.cpp:260-285 loops over
  * the terms *list*).
  */
final case class ParsedQuery(
    terms: Seq[String],
    notTerms: Seq[String],
    isOr: Boolean
) {
  def isEmpty: Boolean = terms.isEmpty
}

/** Query parser with the reference's exact token-level semantics
  * (/root/reference/src/core/query_parser.cpp:4-73; language spec
  * /root/reference/specs/phase3_ranking_query_engine.md:163-195):
  *
  *   - split on single spaces ONLY (tabs survive splitting and are later
  *     broken apart by the tokenizer);
  *   - a standalone `OR` or `or` part (exact match — `Or` is a term) flips the
  *     WHOLE query to union mode, globally, no grouping;
  *   - a part with leading '-' marks everything after the '-' as NOT terms;
  *   - every part is then normalized through the tokenizer, so one part can
  *     produce several terms ("-foo.bar" -> notTerms [foo, bar]).
  */
object QueryParser extends Serializable {

  def parse(q: String): ParsedQuery = {
    val parts = splitOnSpaces(if (q == null) "" else q)
    var isOr = false
    val terms = Seq.newBuilder[String]
    val notTerms = Seq.newBuilder[String]
    parts.foreach { p =>
      if (p == "OR" || p == "or") isOr = true
      else if (p.nonEmpty && p.charAt(0) == '-')
        notTerms ++= Tokenizer.tokenize(p.substring(1))
      else terms ++= Tokenizer.tokenize(p)
    }
    ParsedQuery(terms.result(), notTerms.result(), isOr)
  }

  private def splitOnSpaces(q: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder()
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == ' ') {
        if (cur.length() > 0) { out += cur.toString; cur.setLength(0) }
      } else cur.append(c)
      i += 1
    }
    if (cur.length() > 0) out += cur.toString
    out.result()
  }
}
