package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the data-layout operator behind
  * multi-dimensional scan pruning at 100 TB. A table range-partitioned and
  * sorted by the interleaved-bit curve value keeps rows that are close in
  * BOTH dimensions inside the same files, so parquet min/max footer stats
  * prune a 2-D box query to a handful of files; sorting by (x, y) would
  * cluster only the leading column. The reference's per-zone UPDATE scans
  * (main.py:408-533) are exactly the access pattern this layout serves.
  *
  * The curve value is pure bit arithmetic (shift/and/multiply) — fully
  * whole-stage-codegen, no UDF, no shuffle beyond the one range partition
  * at write time.
  */
object ZOrder {

  /** Interleave the low `bits` of two non-negative cell ids:
    * bit k of x lands at position 2k, bit k of y at 2k+1. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { k =>
      shiftrightunsigned(x, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k)) +
        shiftrightunsigned(y, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1))
    }.reduce(_ + _)

  /** The same interleave as oracle SQL (DuckDB has no shift on the path we
    * need identical semantics for, so plain integer divide/mod). */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { k =>
      val p = 1L << k
      s"((($x // $p) % 2) * ${1L << (2 * k)} + (($y // $p) % 2) * ${1L << (2 * k + 1)})"
    }.mkString("(", " + ", ")")

  /** Cluster `df` on the z-value of two cell columns and write it: one
    * range partition (sampled bounds) + in-partition sort, so every output
    * file covers a compact z-range — i.e. a compact 2-D box. */
  def writeClustered(df: DataFrame, xCell: String, yCell: String, bits: Int,
      files: Int, path: String): Unit =
    df.withColumn("zval", zValue(col(xCell), col(yCell), bits))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(path)
}
