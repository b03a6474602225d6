package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class PiiScrubSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("emails and phones are redacted and counted; clean text is untouched") {
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 555-123-4567 today"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.org one phone 111-222-3333")).toDF("doc_id", "text")
    val out = PiiScrub.scrub(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 1 && out(0).getAs[Long]("n_phones") == 1)
    assert(out(0).getAs[String]("clean_text") == "contact <EMAIL> or <PHONE> today")
    assert(out(1).getAs[Long]("n_emails") == 0 && out(1).getAs[Long]("n_phones") == 0)
    assert(out(1).getAs[String]("clean_text") == "no pii here at all")
    assert(out(2).getAs[Long]("n_emails") == 2 && out(2).getAs[Long]("n_phones") == 1)
    assert(out(2).getAs[String]("clean_text") == "two mails <EMAIL> <EMAIL> one phone <PHONE>")
  }

  test("ssn / ip / credit-card classes: one true positive and one near-miss each") {
    val docs = Seq(
      // SSN true positive vs a too-short near-miss that must NOT match
      (1L, "ssn 123-45-6789 but not 123-45-678"),
      // IP true positive; shape-based contract: out-of-range octets still
      // redact (declared over-redaction), a two-dot near-miss does not
      (2L, "host 10.0.254.3 odd 999.999.999.999 but not 1.2.3"),
      // Luhn-valid card counts in n_ccs; same-shape Luhn-FAILING run does
      // not, yet both redact (conservative shape redaction)
      (3L, "card 4532015112830366 fake 4111111111111112"),
      // 12 digits: too short for the CC shape entirely
      (4L, "order id 123456789012")).toDF("doc_id", "text")
    val out = PiiScrub.scrub(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_ssns") == 1)
    assert(out(0).getAs[String]("clean_text") == "ssn <SSN> but not 123-45-678")
    assert(out(1).getAs[Long]("n_ips") == 2)
    assert(out(1).getAs[String]("clean_text") == "host <IP> odd <IP> but not 1.2.3")
    assert(out(2).getAs[Long]("n_cc_shape") == 2 && out(2).getAs[Long]("n_ccs") == 1)
    assert(out(2).getAs[String]("clean_text") == "card <CC> fake <CC>")
    assert(out(3).getAs[Long]("n_cc_shape") == 0 && out(3).getAs[Long]("n_ccs") == 0)
    assert(out(3).getAs[String]("clean_text") == "order id 123456789012")
  }

  test("luhn arithmetic: known-valid test numbers pass, off-by-one fails, either length parity works") {
    val docs = Seq(
      (1L, "4111111111111111"), // 16 digits, valid
      (2L, "4222222222222"), // 13 digits (odd length), valid Visa test number
      (3L, "4111111111111112"), // valid + 1 → fails
      (4L, "1234567812345670")) // constructed valid
      .toDF("doc_id", "text")
    val got = PiiScrub.scrub(docs).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("n_ccs")).toSeq
    assert(got == Seq(1L, 1L, 0L, 1L))
  }

  test("text_pii_audit: six standing class rows, luhn-valid never exceeds shape") {
    val rows = SparkEntry.queries("text_pii_audit")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    graft.CacheRegistry.releaseAll()
    assert(rows.keySet == Set("cc_luhn_valid", "cc_shape", "email", "ip", "phone", "ssn"))
    val nTotal = graft.Tables.documents(spark, TestSpark.sf).count()
    rows.foreach { case (cls, (nDocs, nHits, rate)) =>
      assert(nDocs <= nTotal && nHits >= nDocs, s"$cls: docs=$nDocs hits=$nHits")
      assert(math.abs(rate - nDocs.toDouble / nTotal) < 1e-3, s"$cls rate $rate")
    }
    assert(rows("cc_luhn_valid")._2 <= rows("cc_shape")._2,
      "luhn-valid hits are a subset of shape hits")
  }
}
