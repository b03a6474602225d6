package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries.cosine

/** Centroid shipping for the assignment step shared by `emb_kmeans` /
  * `dedup_semantic` / `emb_incremental_assign` / `ann_ivf` / `ann_ivfpq`.
  *
  * Two physical paths with IDENTICAL semantics (spec-pinned):
  *
  *  - **Literal** (K×Dim ≤ [[DefaultMaxLiteralDoubles]]): the matrix is
  *    constant-folded into the compiled `TopCells` expression — one JVM
  *    call per row, zero shuffle, zero join. Right up to ~10⁵ doubles;
  *    past that the plan literal itself is the problem (janino method
  *    limits, multi-MB plans shipped with every task).
  *  - **Broadcast relation** (above the threshold): the centroids become a
  *    K-row broadcast table — the MLlib model-shipping shape. Assignment
  *    is a broadcast nested-loop fan-out (map-side, no exchange of the
  *    fact) followed by a per-key max aggregate whose partial combine
  *    collapses the ×K fan-out back to one row per vector BEFORE the one
  *    exchange. Ranking reproduces `TopCells` exactly: round-6 HALF_UP
  *    cosine descending, NaN ranked last, lowest cell id on ties.
  *
  * The threshold is conf-switchable (`spark.graft.centroid.maxLiteralDoubles`)
  * so the large-K path is testable at any corpus size.
  */
object CentroidAssign {

  val ConfKey = "spark.graft.centroid.maxLiteralDoubles"
  val DefaultMaxLiteralDoubles: Long = 1L << 16

  private def maxLiteralDoubles(s: SparkSession): Long =
    s.conf.getOption(ConfKey).map(_.toLong).getOrElse(DefaultMaxLiteralDoubles)

  private def useLiteral(s: SparkSession, cents: Array[Array[Double]]): Boolean =
    cents.length.toLong * (if (cents.isEmpty) 0L else cents(0).length.toLong) <=
      maxLiteralDoubles(s)

  private def centRelation(s: SparkSession, cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("c_id", "c_emb")
  }

  /** TopCells' score in plain columns: round-6 HALF_UP cosine with NaN
    * forced to -∞ (TopCells ranks NaN last; Spark's ordering would rank it
    * FIRST — the one place the two formulations disagree without the guard). */
  private def score6(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val c = cosine(emb, col("c_emb"))
    when(isnan(c), lit(Double.NegativeInfinity)).otherwise(round(c, 6))
  }

  /** Best (argmax) cell per row of `e` (columns: `keyCol`, `emb`).
    * Returns (`keyCol`, emb, cell, c_emb — the winning centroid vector,
    * cos_center — round-4 raw cosine against it). */
  def withBestCell(e: DataFrame, cents: Array[Array[Double]],
      keyCol: String = "vec_id"): DataFrame = {
    val s = e.sparkSession
    if (useLiteral(s, cents)) {
      val centsLit = typedlit(cents.map(_.toSeq).toSeq)
      e.select(col(keyCol), col("emb"),
          element_at(graft.functions.HashExprs.topCells(col("emb"), centsLit, 1), 1).as("cell"))
        .withColumn("c_emb", get(centsLit, col("cell").cast("int")))
        .withColumn("cos_center", round(cosine(col("emb"), col("c_emb")), 4))
    } else {
      // fan-out ×K against the broadcast relation; the max struct compares
      // (score, -cell) — raw cosine and the centroid ride along as payload
      // (negid is unique per key, so they never enter the comparison)
      val sc = struct(score6(col("emb")).as("s6"), (-col("c_id")).as("negid"),
        cosine(col("emb"), col("c_emb")).as("raw"), col("c_emb").as("c_emb"))
      e.crossJoin(broadcast(centRelation(s, cents)))
        .select(col(keyCol), col("emb"), sc.as("sc"))
        .groupBy(col(keyCol))
        .agg(max(col("sc")).as("best"), first(col("emb")).as("emb"))
        .select(col(keyCol), col("emb"), (-col("best.negid")).as("cell"),
          col("best.c_emb").as("c_emb"), round(col("best.raw"), 4).as("cos_center"))
    }
  }

  /** Top-`nprobe` cells per row of `q` (columns: `keyCol`, `emb`), exploded
    * to one row per (key, cell) in rank order. */
  def withProbeCells(q: DataFrame, cents: Array[Array[Double]], nprobe: Int,
      keyCol: String = "vec_id"): DataFrame = {
    val s = q.sparkSession
    if (useLiteral(s, cents)) {
      val centsLit = typedlit(cents.map(_.toSeq).toSeq)
      q.select(col(keyCol), col("emb"),
        explode(graft.functions.HashExprs.topCells(col("emb"), centsLit, nprobe)).as("cell"))
    } else {
      val w = Window.partitionBy(col(keyCol)).orderBy(col("s6").desc, col("c_id"))
      q.crossJoin(broadcast(centRelation(s, cents)))
        .withColumn("s6", score6(col("emb")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= nprobe)
        .select(col(keyCol), col("emb"), col("c_id").as("cell"))
    }
  }
}
