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

  /** Even-odd ray-cast point-in-polygon over a flat [x0,y0,x1,y1,...] vertex
    * array — static so generated code calls the same definition the
    * interpreted path uses. Horizontal edges are skipped by the parity test;
    * the crossing-x formula is plain left-associative IEEE arithmetic so a
    * SQL engine evaluating the same formula (rayCastSql) gets bit-identical
    * doubles. */
  def pointInPolygon(x: Double, y: Double, poly: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val n = poly.numElements() / 2
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = poly.getDouble(2 * i); val yi = poly.getDouble(2 * i + 1)
      val xj = poly.getDouble(2 * j); val yj = poly.getDouble(2 * j + 1)
      if (((yi > y) != (yj > y)) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Multipolygon containment: even-odd ray cast OR'd over rings — the
    * actual geometry PostGIS ST_Within evaluates for the reference's zone
    * dims (boroughs are multipolygons: islands). `rings` is an
    * array<array<double>> of flat vertex arrays. */
  def pointInMultiPolygon(x: Double, y: Double, rings: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val n = rings.numElements()
    var i = 0
    while (i < n) {
      if (pointInPolygon(x, y, rings.getArray(i))) return true
      i += 1
    }
    false
  }

  private val fnName = "haversine_m"
  private val pipName = "point_in_polygon"
  private val pimpName = "point_in_multipolygon"

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
    registry.createOrReplaceTempFunction(pipName, buildPointInPolygon, "built-in")
    registry.createOrReplaceTempFunction(pimpName, buildPointInMultiPolygon, "built-in")
  }

  /** Builder for the multipolygon variant (x, y, array<array<double>>). */
  val buildPointInMultiPolygon: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$pimpName(x, y, rings)")
    def d(e: Expression) = if (e.dataType == DoubleType) e else Cast(e, DoubleType)
    val ringsT = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false), containsNull = false)
    val p = exprs(2).dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ArrayType(DoubleType, _), _) => exprs(2)
      case _ => Cast(exprs(2), ringsT)
    }
    PointInMultiPolygon(d(exprs(0)), d(exprs(1)), p)
  }

  /** Column API for multipolygon containment (requires register(spark)).
    * `rings` is array<array<double>> of flat [x0,y0,...] vertex arrays. */
  def pointInMultiPoly(x: Column, y: Column, rings: Column): Column =
    call_function(pimpName, x, y, rings)

  /** DuckDB SQL fragment for the multipolygon test: the per-ring even-odd
    * ray cast OR'd, generated from the same vertex lists as the plan. */
  def rayCastMultiSql(x: String, y: String, rings: Seq[Seq[(String, String)]]): String =
    rings.map(rayCastSql(x, y, _)).mkString("(", " OR ", ")")

  /** Builder with numeric coercion (SQL integer/decimal literals → double). */
  val buildPointInPolygon: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$pipName(x, y, poly)")
    def d(e: Expression) = if (e.dataType == DoubleType) e else Cast(e, DoubleType)
    val polyT = org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
    val p = exprs(2).dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => exprs(2)
      case _ => Cast(exprs(2), polyT)
    }
    PointInPolygon(d(exprs(0)), d(exprs(1)), p)
  }

  /** Column API for the ray-cast expression (requires register(spark)).
    * `poly` is a flat array<double> of [x0,y0,x1,y1,...] vertices. */
  def pointInPoly(x: Column, y: Column, poly: Column): Column =
    call_function(pipName, x, y, poly)

  /** DuckDB SQL fragment computing the SAME even-odd ray cast over literal
    * vertex-expression pairs — generated from one vertex list so the two
    * engines cannot drift. */
  def rayCastSql(x: String, y: String, vertices: Seq[(String, String)]): String = {
    val n = vertices.size
    val terms = vertices.indices.map { i =>
      val j = if (i == 0) n - 1 else i - 1
      val (xi, yi) = vertices(i)
      val (xj, yj) = vertices(j)
      s"(CASE WHEN (($yi > $y) != ($yj > $y)) AND $x < ($xj - $xi) * ($y - $yi) / ($yj - $yi) + $xi THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
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

/** Multipolygon (multi-ring) containment: the even-odd ray cast OR'd over
  * an array<array<double>> of flat vertex rings — ST_Within against the
  * reference's multipolygon zone dims (main.py:408-533; NYC boroughs have
  * island rings). Same static-scalar codegen pattern as PointInPolygon. */
case class PointInMultiPolygon(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "point_in_multipolygon"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (double, double, array<array<double>>), got $t")
    }

  override protected def nullSafeEval(x: Any, y: Any, rings: Any): Any =
    GeoFunctions.pointInMultiPolygon(
      x.asInstanceOf[Double], y.asInstanceOf[Double],
      rings.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, p) => s"graft.geo.GeoFunctions.pointInMultiPolygon($x, $y, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Even-odd ray-cast containment of point (x, y) in a polygon given as a
  * flat array<double> [x0,y0,x1,y1,...] — the exact-geometry half of the
  * reference's ST_Within zone assignment (main.py:408-533,
  * initialpolygonlinkage/linkthem.py); callers pair it with a broadcast
  * bbox prefilter so the fact side never shuffles. Codegen calls the static
  * scalar so generated and interpreted paths share one definition and the
  * expression stays inside whole-stage codegen. */
case class PointInPolygon(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "point_in_polygon"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType, org.apache.spark.sql.types.ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (double, double, array<double>), got $t")
    }

  override protected def nullSafeEval(x: Any, y: Any, poly: Any): Any =
    GeoFunctions.pointInPolygon(
      x.asInstanceOf[Double], y.asInstanceOf[Double],
      poly.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, p) => s"graft.geo.GeoFunctions.pointInPolygon($x, $y, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
