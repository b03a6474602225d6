package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column ↔ Expression converters (Spark 4 wraps
  * Columns in ColumnNodes; `classic.ExpressionUtils` is `private[sql]`).
  * Lives in the org.apache.spark.sql package for access only — the standard
  * pattern Spark extension libraries use to expose custom Expressions as
  * Columns without a FunctionRegistry round-trip (needed when an expression
  * carries a non-Expression payload, e.g. a driver-built Bloom filter,
  * that no SQL-callable builder could receive). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
