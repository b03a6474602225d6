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

    // The whole right payload travels as ONE struct: last(ignoreNulls) over
    // the struct picks the entire matched row atomically. Filling each
    // payload column independently would stitch together attributes of
    // different right rows whenever the matched row holds a NULL field
    // (an older row's value would leak through for just that column).
    val pType = org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c)))
    val lTagged = left.withColumn("_at", col(leftTime)).withColumn("_tag", lit(1))
      .withColumn("_p", lit(null).cast(pType))
    val rTagged = leftCols.foldLeft(
      right.select(on.map(col) :+ struct(payload.map(col): _*).as("_p")
          :+ col(rightTime).as("_at"): _*)
        .withColumn("_tag", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val cols = on ++ leftCols ++ Seq("_p", "_at", "_tag")
    val unioned = lTagged.select(cols.map(col): _*)
      .unionByName(rTagged.select(cols.map(col): _*))

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_at").asc, col("_tag").asc,
        col("_p").getField(rightId).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    payload.foldLeft(filled.filter(col("_tag") === 1)) { (df, c) =>
      df.withColumn(c, col("_p").getField(c))
    }.drop("_at", "_tag", "_p")
  }

  /** Column helper: the window ordering used above, exposed for specs. */
  def orderingOf(rightId: String): Seq[Column] =
    Seq(col("_at").asc, col("_tag").asc, col("_p").getField(rightId).asc_nulls_first)
}
