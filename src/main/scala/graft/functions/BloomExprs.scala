package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a codegen'd Catalyst expression.
  *
  * Spark builds `org.apache.spark.util.sketch.BloomFilter` distributedly
  * (`df.stat.bloomFilter` — per-partition sketches merged on the driver)
  * but exposes no public expression to PROBE one inside a plan; its
  * internal `BloomFilterMightContain` is reserved for runtime join
  * pruning. This wraps a driver-built filter as a referenced object in
  * generated code, so a scan-side `filter(might_contain(key))` runs inside
  * whole-stage codegen with zero serialization per row.
  *
  * A Bloom filter has NO false negatives, so `!mightContain(k)` proves k
  * absent — the property the ingest prefilter (EtlQueries.ingestBloom)
  * relies on for exact results.
  */
object BloomExprs {

  /** Column API: true iff `key` (long) might be in `bloom`. */
  def mightContainLong(bloom: BloomFilter, key: Column): Column =
    column(BloomMightContainLong(expression(key), bloom))
}

/** Membership probe of a long key against a driver-built Bloom filter. The
  * filter rides along as part of the (serializable) expression and is
  * referenced directly from generated code. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT key")

  override protected def nullSafeEval(key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, k => s"$ref.mightContainLong($k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
