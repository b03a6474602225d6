package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

import graft.geo.HaversineMeters

/** SparkSessionExtensions entry point so graft's custom expressions are
  * available in plain SQL on any session, including thrift/connect servers:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (Equivalent to the per-session GeoFunctions.register used by the query
  * library, but injected at session build time.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in containment-join → cell-equi-join rewrite
    // (spark.graft.rewriteContainmentJoin=true)
    ext.injectOptimizerRule(_ => graft.plans.RewriteContainmentJoin)
    ext.injectFunction((
      new FunctionIdentifier("haversine_m"),
      new ExpressionInfo(classOf[HaversineMeters].getName, "haversine_m"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 4, "haversine_m(lat1, lng1, lat2, lng2)")
        val d = exprs.map(e => if (e.dataType == DoubleType) e else Cast(e, DoubleType))
        HaversineMeters(d(0), d(1), d(2), d(3))
      }))
  }
}
