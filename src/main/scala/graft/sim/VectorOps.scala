package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding maintenance ops (SURVEY.md §2 #24b): L2 normalization and
  * symmetric int8 quantization — the two transforms every embedding corpus
  * goes through before ANN serving. Map-side only, no shuffle at any scale.
  */
object VectorOps {

  /** #24b: per-vector L2 norm, normalized (rounded) vector, and int8
    * quantization scale + codes. Array-valued results are emitted as
    * '|'-joined strings (unit components scaled to 1e-5 integer grid) so the
    * driver's row-sort/hash — which cannot hash array cells — stays happy;
    * `n_dims` keeps the structural check. */
  def embNormalize(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HashExprs.register(s)
    val emb = col("embedding").cast("array<double>")
    Tables.embeddings(s, dir)
      .select(col("vec_id"), emb.as("emb"))
      .withColumn("norm",
        sqrt(aggregate(col("emb"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("unit",
        array_join(transform(col("emb"),
          x => round(x / col("norm") * lit(100000.0)).cast("long")), "|"))
      .withColumn("maxabs", aggregate(col("emb"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("q8",
        array_join(transform(col("emb"),
          x => round(x * lit(127.0) / col("maxabs")).cast("long")), "|"))
      .select(col("vec_id"), size(col("emb")).cast("long").as("n_dims"),
        round(col("norm"), 6).as("norm"),
        col("unit"), round(col("maxabs"), 6).as("maxabs"), col("q8"))
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_normalize" -> (embNormalize _))

  val oracles: Map[String, String] = Map(
    "emb_normalize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb,
        |  sqrt(list_dot_product(emb, emb)) AS norm,
        |  list_max(list_transform(emb, x -> abs(x))) AS maxabs
        | FROM e)
        |SELECT vec_id, len(emb)::BIGINT AS n_dims, round(norm, 6) AS norm,
        | array_to_string(list_transform(emb, x -> round(x / norm * 100000.0)::BIGINT), '|') AS unit,
        | round(maxabs, 6) AS maxabs,
        | array_to_string(list_transform(emb, x -> round(x * 127.0 / maxabs)::BIGINT), '|') AS q8
        |FROM n ORDER BY vec_id""".stripMargin)
}
