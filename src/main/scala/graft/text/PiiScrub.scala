package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII scrubbing (SURVEY.md §2 #27b): regex redaction of emails/phones plus
  * redaction counts — a standard pre-training hygiene pass. Patterns use
  * only character classes and bounded quantifiers so Java regex (Spark) and
  * RE2 (DuckDB) agree exactly. Map-side only; no shuffle at any scale.
  */
object PiiScrub {

  val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  val PhonePat = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def scrub(df: DataFrame): DataFrame =
    df
      .withColumn("n_emails", size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(col("text"), lit(PhonePat), lit(0))).cast("long"))
      .withColumn("clean_text",
        regexp_replace(regexp_replace(col("text"), EmailPat, "<EMAIL>"), PhonePat, "<PHONE>"))

  def piiScrub(s: SparkSession, dir: String): DataFrame =
    scrub(Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), md5(col("clean_text")).as("clean_digest"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_scrub" -> (piiScrub _))

  val oracles: Map[String, String] = Map(
    "text_pii_scrub" ->
      s"""SELECT doc_id,
         | len(regexp_extract_all(text, '$EmailPat'))::BIGINT AS n_emails,
         | len(regexp_extract_all(text, '$PhonePat'))::BIGINT AS n_phones,
         | md5(regexp_replace(regexp_replace(text, '$EmailPat', '<EMAIL>', 'g'), '$PhonePat', '<PHONE>', 'g')) AS clean_digest
         |FROM documents ORDER BY doc_id""".stripMargin)
}
