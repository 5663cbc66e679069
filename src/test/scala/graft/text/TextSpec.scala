package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit fixtures for the PII scrub primitives — the redaction behavior
  * itself, independent of the (PII-free) corpus fixture: emails/phones at
  * string boundaries, separator variants, near-misses that must NOT
  * match, and the email-before-phone ordering that keeps email-local-part
  * digits out of the phone pattern. `text_pii_scrub` then cross-verifies
  * the same patterns against DuckDB on injected synthetic PII. */
class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(texts: Seq[String]): Seq[(Int, Int, String)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(
        TextFunctions.emailCount(col("text")).as("e"),
        TextFunctions.phoneCount(col("text")).as("p"),
        TextFunctions.scrubPii(col("text")).as("s"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
  }

  private def one(text: String): (Int, Int, String) = run(Seq(text)).head

  test("emails are counted and redacted at start, middle, and end of string") {
    assert(one("alice@example.com wrote this") ==
      ((1, 0, "[EMAIL] wrote this")))
    assert(one("reply to bob.smith+tag@sub.domain.org for details") ==
      ((1, 0, "reply to [EMAIL] for details")))
    assert(one("send mail to carol_99@test.co") ==
      ((1, 0, "send mail to [EMAIL]")))
  }

  test("multiple emails in one document are each redacted") {
    assert(one("a@x.com then b@y.org") == ((2, 0, "[EMAIL] then [EMAIL]")))
  }

  test("phone variants: +prefix, parens, dashes, spaces") {
    assert(one("call +1 (555) 012-3456 now") == ((0, 1, "call [PHONE] now")))
    assert(one("tel: 555-012-3456") == ((0, 1, "tel: [PHONE]")))
    assert(one("+44 20 7946 0958") == ((0, 1, "[PHONE]")))
    assert(one("digits 01234567 end") == ((0, 1, "digits [PHONE] end")))
  }

  test("phone at string boundaries") {
    assert(one("555-012-3456 called") == ((0, 1, "[PHONE] called")))
    assert(one("they dialed 555-012-3456") == ((0, 1, "they dialed [PHONE]")))
  }

  test("near-misses are NOT redacted") {
    // no TLD / no domain dot → not an email; short digit runs → not phones
    val clean = Seq(
      "mention a@b without tld",
      "user at domain dot com",
      "only 12345 digits",
      "short 123 456 run",
      "version 1.2.3 of the lib")
    run(clean).zip(clean).foreach { case ((e, p, s), t) =>
      assert(e == 0 && p == 0 && s == t, s"false positive on: $t -> $s")
    }
  }

  test("clean text is a byte-exact no-op through the scrub") {
    val prose = "The quick brown fox jumps over the lazy dog, twice."
    assert(one(prose) == ((0, 0, prose)))
  }

  test("email redaction runs first: local-part digits never leave phone residue") {
    // '20251234567' inside the local part is phone-shaped on its own: the
    // raw-text phone COUNT sees it (identically on both engines), but the
    // scrub replaces the email first, so no '[PHONE]' token ever appears
    // inside a redacted address
    assert(one("u20251234567@example.com") == ((1, 1, "[EMAIL]")))
  }

  test("documents with both kinds redact both") {
    assert(one("u7@ex.com or +1 (555) 0107") == ((1, 1, "[EMAIL] or [PHONE]")))
  }

  test("the text_pii_scrub injected-cohort shape yields exactly one email and one phone") {
    // mirror of the in-query injection for doc_id = 33 — pins the cohort
    // contract the oracle comparison relies on (nonzero counts)
    assert(one("some doc text contact: u33@example.com or +1 (555) 0133") ==
      ((1, 1, "some doc text contact: [EMAIL] or [PHONE]")))
  }

  test("null text propagates null counts and scrub, never throws") {
    import spark.implicits._
    val out = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(
        TextFunctions.emailCount(col("text")),
        TextFunctions.phoneCount(col("text")),
        TextFunctions.scrubPii(col("text")))
      .head
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }
}
