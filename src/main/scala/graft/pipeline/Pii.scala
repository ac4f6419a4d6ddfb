package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — a standard LLM-training-data pipeline stage
  * (scrub personal data BEFORE the corpus ships to training; the reference
  * pipeline stops at OCR/indexing, so this is an extension in the same
  * spirit as the dedup/quality operators).
  *
  * Three detector classes, chosen to behave IDENTICALLY under Java regex
  * (Spark) and RE2 (the DuckDB oracle) — plain character classes and
  * bounded repetition only, no lookaround, no backreferences:
  *
  *   - email:    [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}
  *   - ipv4:     \d{1,3}(\.\d{1,3}){3}  (syntactic — a scrubber
  *               over-redacts rather than leak; octet-range validation
  *               would keep "999.1.1.1" which leaks shape anyway)
  *   - idnum:    \d{9,}  (account/SSN/phone-like long digit runs; applied
  *               AFTER ipv4 so dotted octets don't partially match)
  *
  * Redaction is sequential (email -> ipv4 -> idnum) with typed tokens, so
  * counts are computed on the ORIGINAL text and each later pattern runs on
  * the previous stage's output — the oracle applies the same three
  * `regexp_replace(..., 'g')` in the same order. Everything is built-in
  * `regexp_*` Catalyst expressions: codegen'd, zero UDFs, row-local (zero
  * shuffle — scales by partition count alone at 100 TB).
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val IdNumRe = "\\d{9,}"

  val EmailToken = "<EMAIL>"
  val Ipv4Token = "<IP>"
  val IdNumToken = "<IDNUM>"

  /** Redacted text column (email -> ipv4 -> idnum, typed tokens). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        Ipv4Re, Ipv4Token),
      IdNumRe, IdNumToken)

  /** (doc_id, n_email, n_ipv4, n_idnum, clean_text): per-class REDACTION
    * counts + the fully redacted text. Each class is counted on the text
    * the previous stage produced — exactly what its redaction pass sees —
    * so counts always equal emitted tokens: an IP-shaped substring inside
    * an email never books an <IP> (the email swallowed it), and a dotted
    * octet never books an <IDNUM>.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, EmailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Re, Ipv4Token)
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).as("n_ipv4"),
      size(regexp_extract_all(afterIp, lit(IdNumRe), lit(0))).as("n_idnum"),
      redact(t).as("clean_text")
    )
  }
}
