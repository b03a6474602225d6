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

  /** Per-document simhash plus Hamming-≤3 near-dup pairs via 16-bit bands.
    * The hash is the compiled SimHash64 expression (see HashExprs); the
    * repartition barrier stops Catalyst re-inlining it into each band row. */
  def nearDupPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HashExprs.register(s)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.HashExprs.simhash64(split(col("text"), "\\s+")).as("simhash"))
      .repartition(col("doc_id"))
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
