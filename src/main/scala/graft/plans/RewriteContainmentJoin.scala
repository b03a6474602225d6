package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite point-in-box containment joins (which Spark can
  * only plan as nested-loop joins) into grid-cell equi-joins plus an exact
  * residual predicate — the RangeJoin decomposition (operators/RangeJoin)
  * applied automatically by Catalyst.
  *
  * Matches `Inner Join ON lng >= west AND lng < east AND lat >= south AND
  * lat < north` where lng/lat come from one side and the bounds from the
  * other. The bounds side is exploded over the covering cells (boxes span
  * few cells at the 0.05° grid), the points side is keyed by its cell, and
  * the join becomes a hash join on the cell id. The original predicate is
  * kept as a residual filter, so semantics are exactly preserved.
  *
  * Gated off by default (`spark.graft.rewriteContainmentJoin=true` to
  * enable): for dims that fit a broadcast, nested-loop is already optimal;
  * this rewrite is for the 40k-intersections / census-blocks regime where
  * the dim outgrows a broadcast and nested-loop goes quadratic.
  */
object RewriteContainmentJoin extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rewriteContainmentJoin"
  val CellDeg = 0.05
  private val CellStride = 100000L

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "false") != "true") return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          // fixed-point guard: the rewritten join keeps the original
          // predicate as residual, so it must not match again
          if !cond.references.exists(_.name.startsWith("_gcell")) =>
        val dims = matchIntervalDims(left, right, cond)
        // by the time this rule runs, constant bounds (e.g. literal lat
        // limits) have been folded and pushed out of the join — match on
        // whatever interval dimensions remain (1-D is the common survivor)
        if (dims.nonEmpty && dims.length <= 2)
          rewrite(j, left, right, cond, hint, dims)
        else j
    }
  }

  /** Interval dimensions: point attr from `left` bounded below (>=) and
    * above (<) by attrs from `right`. */
  private def matchIntervalDims(left: LogicalPlan, right: LogicalPlan, cond: Expression)
      : Seq[(Attribute, Attribute, Attribute)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // double-typed dims only: the Floor(Divide(x, 0.05))/Sequence cell
    // decomposition is numeric — matching a date/string/decimal interval
    // join here would rewrite a valid plan into an invalid one
    def isDouble(a: Attribute) = a.dataType == org.apache.spark.sql.types.DoubleType
    val ges = conjuncts.collect {
      case GreaterThanOrEqual(a: Attribute, b: Attribute)
        if isDouble(a) && isDouble(b) &&
          left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
    }
    val lts = conjuncts.collect {
      case LessThan(a: Attribute, b: Attribute)
        if isDouble(a) && isDouble(b) &&
          left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
    }
    ges.flatMap { case (a, lo) =>
      lts.collectFirst { case (a2, hi) if a2.semanticEquals(a) => (a, lo, hi) }
    }.distinct
  }

  private def cellIdx(x: Expression): Expression = Floor(Divide(x, Literal(CellDeg)))

  private def cellSeq(lo: Expression, hi: Expression): Expression = {
    val start = cellIdx(lo)
    // [floor(lo/c), floor(hi/c)] is a PROVABLE superset of the cells any
    // matching point occupies (IEEE division is monotone; the residual
    // predicate rechecks exactly) — the earlier 1e-12 nudge silently
    // missed points between a cell edge and a straddling hi (ADVICE r2,
    // same fix as operators/RangeJoin)
    val stop = Floor(Divide(hi, Literal(CellDeg)))
    val seq = new Sequence(start, stop, Some(Literal(1L)))
      // Sequence is TimeZoneAwareExpression: without an explicit zone the
      // plan flips back to unresolved after this rule runs
      .withTimeZone(conf.sessionLocalTimeZone)
    // degenerate box (hi <= lo): the nested-loop predicate just returns no
    // rows, so the rewrite must too — Sequence with start > stop throws
    If(LessThan(stop, start),
      Literal.create(Array.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)),
      seq)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint,
      dims: Seq[(Attribute, Attribute, Attribute)]): LogicalPlan = {
    // point-side key: fold cell indices of each dim into one long
    val pKey = dims.map(d => cellIdx(d._1))
      .reduceLeft[Expression]((acc, c) => Add(Multiply(acc, Literal(CellStride)), c))
    val pCell = Alias(pKey, "_gcell_p")()
    val newLeft = Project(left.output :+ pCell, left)

    // bounds side: one Generate per dim over the covering cells
    var gen: LogicalPlan = right
    val cellAttrs = dims.zipWithIndex.map { case ((_, lo, hi), i) =>
      val attr = AttributeReference(s"_gcx$i", LongType, nullable = false)()
      gen = Generate(Explode(cellSeq(lo, hi)), Nil, outer = false, None, Seq(attr), gen)
      attr
    }
    val bKey = cellAttrs.map(a => a: Expression)
      .reduceLeft[Expression]((acc, c) => Add(Multiply(acc, Literal(CellStride)), c))
    val bCell = Alias(bKey, "_gcell_b")()
    val newRight = Project(right.output :+ bCell, gen)

    val joined = Join(newLeft, newRight, Inner,
      Some(And(EqualTo(pCell.toAttribute, bCell.toAttribute), cond)), hint)
    Project(j.output, joined)
  }
}
