package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal binary-column plumbing (SURVEY.md §2 #30).
  *
  * Media payloads are opaque `binary` columns with typed metadata. Here the
  * "payload" is the UTF-8 encoding of the document text (the container has
  * no media libs), and the decode step is a deterministic stub — but the
  * Spark-side plumbing (binary column, byte length, digest, derived
  * dimensions, batched partition-wise processing in BinaryPipeline) is real.
  */
object MultimodalQueries {

  /** #30 Binary metadata projection: encode→bytes→digest→stub-decoded dims. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        octet_length(bin).cast("long").as("byte_len"),
        md5(col("text")).as("digest"),
        col("source"))
      // stubbed deterministic "decode": dimensions derived from payload size
      // and id — stands in for image decode (width/height/frames).
      .withColumn("width", lit(32L) + col("byte_len") % 64)
      .withColumn("height", lit(32L) + col("doc_id") % 48)
      .withColumn("n_frames", lit(1L) + col("doc_id") % 3)
      .withColumn("media_type",
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (binaryMeta _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len, md5(text) AS digest, source,
        | 32 + octet_length(encode(text))::BIGINT % 64 AS width,
        | 32 + doc_id % 48 AS height,
        | 1 + doc_id % 3 AS n_frames,
        | CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type
        |FROM documents ORDER BY doc_id""".stripMargin)
}
