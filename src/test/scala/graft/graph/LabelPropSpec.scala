package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `graph_labelprop`: two planted cliques joined by one bridge resolve to
  * exactly two communities, and the corpus run is deterministic with every
  * node labeled. */
class LabelPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("two bridged cliques resolve to two communities") {
    import spark.implicits._
    // clique A = {0..4}, clique B = {10..14}, bridge 4—10
    val cliqueA = for (u <- 0L to 4L; v <- 0L to 4L if u < v) yield (u, v)
    val cliqueB = for (u <- 10L to 14L; v <- 10L to 14L if u < v) yield (u, v)
    val edges = (cliqueA ++ cliqueB :+ (4L, 10L)).toDF("u", "v")
    val adj = edges.selectExpr("u AS node", "v AS nb")
      .union(edges.selectExpr("v AS node", "u AS nb"))
    val docs = ((0L to 4L) ++ (10L to 14L)).toDF("doc_id")
    val got = LabelProp.propagate(docs, adj).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comA = (0L to 4L).map(got)
    val comB = (10L to 14L).map(got)
    assert(comA.distinct.size == 1, s"clique A split: $got")
    assert(comB.distinct.size == 1, s"clique B split: $got")
    assert(comA.head != comB.head, s"bridge merged the cliques: $got")
  }

  test("corpus run labels every node, sizes are consistent, rerun identical") {
    val rows = LabelProp.labelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length == total)
    val bySize = rows.groupBy(_._2)
    bySize.foreach { case (c, ms) =>
      assert(ms.forall(_._3 == ms.length.toLong), s"community $c size mismatch")
    }
    assert(bySize.size > 1 && bySize.size < total, s"degenerate communities: ${bySize.size}")
    val rerun = LabelProp.labelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq == rerun.sortBy(_._1).toSeq)
  }

  test("converged flag: the bipartite oscillator reads false, a settled clique reads true") {
    import spark.implicits._
    // a single edge {1,2} is the minimal bipartite structure: synchronous
    // LPA swaps the two labels every round forever (Raghavan's known
    // oscillation), so round R-1 vs round R always differ — the budget
    // truncates a non-converged run and the flag must SAY so
    val edge = Seq((1L, 2L)).toDF("u", "v")
    val adj = edge.selectExpr("u AS node", "v AS nb")
      .union(edge.selectExpr("v AS node", "u AS nb"))
    val osc = LabelProp.propagate(Seq(1L, 2L).toDF("doc_id"), adj).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(osc == Map(1L -> false, 2L -> false),
      s"the 2-node oscillator never converges: $osc")
    // a triangle settles on min-label by round 1 and stays — all true
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("u", "v")
    val tadj = tri.selectExpr("u AS node", "v AS nb")
      .union(tri.selectExpr("v AS node", "u AS nb"))
    val settled = LabelProp.propagate(Seq(0L, 1L, 2L).toDF("doc_id"), tadj).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(settled.values.forall(identity), s"settled triangle must read converged: $settled")
  }
}
