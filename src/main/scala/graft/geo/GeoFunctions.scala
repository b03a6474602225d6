package graft.geo

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Geospatial primitives for the crash-mapper surface.
  *
  * The reference computes haversine distance driver-side in Python
  * (main.py:1117-1129) to detect moved geometries; here it is a codegen'd
  * Catalyst expression so it runs inside whole-stage codegen on the
  * executors — no UDF serialization, no boxing in the hot join loop.
  */
object GeoFunctions {

  final val EarthRadiusMeters = 6372800.0 // same sphere radius as main.py:1120

  /** Scalar haversine — referenced from generated code, keep it static. */
  def haversineMeters(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lng2 - lng1)
    val rLat1 = math.toRadians(lat1)
    val rLat2 = math.toRadians(lat2)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(rLat1) * math.cos(rLat2) * math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * EarthRadiusMeters * math.asin(math.sqrt(a))
  }

  private val fnName = "haversine_m"

  /** Idempotently register custom expressions with a session so they can be
    * used via call_function / SQL. */
  def register(spark: SparkSession): Unit = synchronized {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      fnName,
      { exprs: Seq[Expression] =>
        require(exprs.length == 4, s"$fnName(lat1, lng1, lat2, lng2)")
        val d = exprs.map(e => if (e.dataType == DoubleType) e else Cast(e, DoubleType))
        HaversineMeters(d(0), d(1), d(2), d(3))
      },
      "built-in")
  }

  /** Column API for the codegen expression (requires register(spark)). */
  def haversineM(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column =
    call_function(fnName, lat1, lng1, lat2, lng2)

  /** Same formula composed from built-in codegen'd functions — used by specs
    * to cross-check the custom expression, and as a fallback path. */
  def haversineComposed(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lng2 - lng1)
    val a = pow(sin(dLat / 2), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** DuckDB SQL fragment mirroring haversineMeters exactly (same op order). */
  def haversineSql(lat1: String, lng1: String, lat2: String, lng2: String): String =
    s"(2 * 6372800.0 * asin(sqrt(" +
      s"sin(radians(($lat2) - ($lat1)) / 2) * sin(radians(($lat2) - ($lat1)) / 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"sin(radians(($lng2) - ($lng1)) / 2) * sin(radians(($lng2) - ($lng1)) / 2))))"
}

/** Fused haversine distance in meters. Codegen calls the static scalar so
  * interpreted and generated paths share one definition. */
case class HaversineMeters(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires four DOUBLE arguments")
  override def prettyName: String = "haversine_m"

  override protected def nullSafeEval(lat1: Any, lng1: Any, lat2: Any, lng2: Any): Any =
    GeoFunctions.haversineMeters(
      lat1.asInstanceOf[Double], lng1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lng2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.geo.GeoFunctions.haversineMeters($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
