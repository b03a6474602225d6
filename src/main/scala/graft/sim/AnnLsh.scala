package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.DedupQueries.cosine

/** LSH-bucketed approximate nearest neighbours (SURVEY.md §2 #25).
  *
  * Random-hyperplane LSH: 16 sign bits per vector (hyperplane p's component
  * for dimension d is ±1, derived from xxhash64(p·1000003 + d), so the
  * planes are deterministic and identical on every executor with no
  * broadcast of plane matrices needed). Bits are grouped into 4 bands of 4;
  * a corpus vector is a candidate for a query if any band matches
  * (OR-amplification). Candidates are ranked by exact cosine, top-10 kept.
  *
  * Scale: the corpus is hashed map-side in one pass; the only shuffle is the
  * (band, key) equi-join against the tiny broadcast query set — versus the
  * brute-force full scan per query. Recall is measured against the brute
  * baseline in AnnLshSpec.
  */
object AnnLsh {

  val Planes = 16
  val BandBits = 4
  val NumBands = Planes / BandBits

  /** Sign bit of emb·plane(p) for p in [0, Planes). */
  private def signBits(emb: Column): Column =
    transform(sequence(lit(0), lit(Planes - 1)), p =>
      when(
        aggregate(sequence(lit(0), lit(63)), lit(0.0), (acc, d) =>
          acc + element_at(emb, d + 1) *
            when(xxhash64(p * 1000003 + d) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))) >= 0,
        lit(1L)).otherwise(lit(0L)))

  /** Pack band b of the bit array into a small integer key. */
  private def bandKey(bits: Column, band: Column): Column =
    aggregate(sequence(lit(0), lit(BandBits - 1)), lit(0L),
      (acc, i) => acc * 2 + element_at(bits, band * BandBits + i + 1))

  def annTopkLsh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HashExprs.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("bits", signBits(col("emb")))
    val banded = e
      .select(col("vec_id"), col("emb"), explode(sequence(lit(0), lit(NumBands - 1))).as("band"), col("bits"))
      .withColumn("bkey", bandKey(col("bits"), col("band")))
      .drop("bits")
    val q = banded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("band"), col("bkey"))
    val c = banded.select(col("vec_id").as("n_id"), col("emb").as("n_emb"), col("band"), col("bkey"))
    val candidates = c.join(broadcast(q), Seq("band", "bkey"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id", "q_emb", "n_emb")
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    candidates
      .withColumn("cosine", round(cosine(col("q_emb"), col("n_emb")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "n_id", "rank", "cosine")
      .orderBy(col("q_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_lsh_bucketed" -> (annTopkLsh _))
}
