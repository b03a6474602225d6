package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SimHash near-duplicate detection (SURVEY.md §2 #22).
  *
  * 64-bit SimHash per document: each bit is the sign of the ±1 vote sum of
  * the token hashes at that bit position. Near-dups are pairs within
  * Hamming distance ≤ 3, found without an all-pairs scan by the 4-band
  * pigeonhole: two hashes within distance 3 must agree exactly on at least
  * one of four 16-bit bands, so the self-join is an equi-join on
  * (band, 16-bit key) — a uniform-key shuffle, sub-quadratic at scale.
  *
  * The bit arithmetic is expressed in Spark SQL (nested lambda aggregates)
  * so the whole computation stays inside whole-stage codegen.
  */
object SimHash {

  /** SQL expression for the 64-bit simhash of a whitespace-token column. */
  val simhashExpr: String =
    """aggregate(sequence(0, 63), 0L, (acc, b) ->
      |  acc + if(
      |    aggregate(split(text, '\\s+'), 0L,
      |      (a2, w) -> a2 + if((shiftright(xxhash64(w), b) & 1L) = 1L, 1L, -1L)) >= 0,
      |    shiftleft(1L, b), 0L))""".stripMargin

  /** Per-document simhash plus Hamming-≤3 near-dup pairs via 16-bit bands. */
  def nearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), expr(simhashExpr).as("simhash"))
    val banded = docs
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey", expr("(shiftright(simhash, band * 16) & 65535L)"))
    val a = banded.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"), col("band"), col("bkey"))
    val b = banded.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_sh ^ b_sh)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("a_id"), col("b_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_simhash" -> (nearDupPairs _))
}
