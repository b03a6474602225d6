package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

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
}
