package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with the
  * greatest right-time ≤ left-time within the same keys (pandas merge_asof /
  * kdb aj). Spark has no native as-of join; the naive formulation
  * (inequality join + per-left-row argmax) explodes into a range join.
  *
  * The scalable decomposition: tag both sides, UNION them, and run ONE
  * window pass per key ordered by (time, tag, right-id) carrying the last
  * non-null right payload forward. Right rows sort before left rows at the
  * same timestamp (tag 0 < 1), so equal times match; ties between right
  * rows resolve to the highest id (deterministic). Cost is a single
  * shuffle-and-sort of both inputs on the key — no range explosion, no
  * broadcast requirement, skew bounded by key cardinality. This is the
  * shape that survives 100 TB.
  */
object AsofJoin {

  /** @param on        equi-join key columns (shared names)
    * @param leftTime  left timestamp column
    * @param rightTime right timestamp column
    * @param rightId   unique right column used as the deterministic
    *                  tie-break among right rows with equal timestamps;
    *                  carried into the output
    * @param rightVals additional right payload columns to carry
    * @return left rows + rightId/rightVals of the as-of match (null when no
    *         right row precedes)
    */
  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightId: String,
      rightVals: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.filterNot(on.contains)
    val payload = rightId +: rightVals

    val lTagged = payload.foldLeft(
      left.withColumn("_at", col(leftTime)).withColumn("_tag", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val rTagged = leftCols.foldLeft(
      right.select((on ++ payload).map(col) :+ col(rightTime).as("_at"): _*)
        .withColumn("_tag", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unioned = lTagged.select((on ++ leftCols ++ payload ++ Seq("_at", "_tag")).map(col): _*)
      .unionByName(rTagged.select((on ++ leftCols ++ payload ++ Seq("_at", "_tag")).map(col): _*))

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_at").asc, col("_tag").asc, col(rightId).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_tag") === 1).drop("_at", "_tag")
  }

  /** Column helper: the window ordering used above, exposed for specs. */
  def orderingOf(rightId: String): Seq[Column] =
    Seq(col("_at").asc, col("_tag").asc, col(rightId).asc_nulls_first)
}
