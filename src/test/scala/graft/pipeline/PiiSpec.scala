package graft.pipeline

import graft.SparkTestBase

/** PII scrub: typed redaction, per-class counts, ordering rules (an IP is
  * never double-counted as a digit run; digits inside an email are not
  * counted once the email is redacted).
  */
class PiiSpec extends SparkTestBase {

  private def scrubOne(text: String): (Int, Int, Int, String) = {
    val sp = spark
    import sp.implicits._
    val r = Pii.scrub(Seq((1L, text)).toDF("doc_id", "text")).head()
    (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
  }

  test("email, ipv4, and long digit runs are detected and redacted with typed tokens") {
    assert(scrubOne("contact john.doe+x@sub.example.co.uk now") ==
      ((1, 0, 0, "contact <EMAIL> now")))
    assert(scrubOne("server 10.0.0.1 and 999.999.999.999 up") ==
      ((0, 2, 0, "server <IP> and <IP> up"))) // syntactic: over-redact, never leak
    assert(scrubOne("acct 123456789 vs card 12345678") ==
      ((0, 0, 1, "acct <IDNUM> vs card 12345678"))) // 9+ digits only
    assert(scrubOne("a@b.com 1.2.3.4 987654321") == ((1, 1, 1, "<EMAIL> <IP> <IDNUM>")))
  }

  test("ordering: IPs are not double-counted as digit runs; email digits are not idnums") {
    val (e1, i1, d1, t1) = scrubOne("just 10.0.0.1 here")
    assert((e1, i1, d1) == ((0, 1, 0)) && t1 == "just <IP> here")
    val (e2, i2, d2, t2) = scrubOne("mail 12345678901@example.io sent")
    assert((e2, i2, d2) == ((1, 0, 0)) && t2 == "mail <EMAIL> sent")
    // an IP-shaped substring inside an email books NO <IP>: counts are
    // per-stage, so they always equal the tokens actually emitted
    val (e3, i3, d3, t3) = scrubOne("john.1.2.3.4@example.com wrote")
    assert((e3, i3, d3) == ((1, 0, 0)) && t3 == "<EMAIL> wrote")
  }

  test("clean text: no matches means untouched text and zero counts") {
    assert(scrubOne("plain table scan merge uq123") == ((0, 0, 0, "plain table scan merge uq123")))
  }
}
