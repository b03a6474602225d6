package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `graph_coreness` contract: the H-index iteration's output equals a
  * classic driver-side peel (TRUE coreness) on the corpus graph AND has
  * reached its fixpoint inside the budget (a driver replica of round
  * R+1 changes nothing); planted topologies pin the textbook values —
  * clique-with-tail (clique 3, tail 1), star (all 1), disjoint
  * triangles (2), isolated node (0). */
class CorenessSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  /** Classic sequential peel: true coreness. */
  private def peelCoreness(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    nodes.foreach(n => adj(n) = scala.collection.mutable.Set[Long]())
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    val core = scala.collection.mutable.Map[Long, Long]()
    val alive = scala.collection.mutable.Set(nodes: _*)
    var k = 0L
    while (alive.nonEmpty) {
      var changed = true
      while (changed) {
        changed = false
        alive.toSeq.foreach { v =>
          if (adj(v).count(alive.contains) <= k) {
            core(v) = k; alive -= v; changed = true
          }
        }
      }
      k += 1
    }
    core.toMap
  }

  /** Driver replica of the H-index iteration for a given round count. */
  private def hIter(nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = nodes.map(n => n -> Seq.empty[Long]).toMap ++
      (edges ++ edges.map(e => (e._2, e._1))).groupBy(_._1)
        .map { case (u, es) => u -> es.map(_._2) }
    var c = adj.map { case (v, nb) => v -> nb.size.toLong }
    for (_ <- 1 to rounds) {
      c = adj.map { case (v, nb) =>
        val sorted = nb.map(c).sortBy(-_)
        val h = sorted.zipWithIndex.map { case (cv, i) => math.min(i + 1L, cv) }
          .foldLeft(0L)(math.max)
        v -> h
      }
    }
    c
  }

  test("equals the classic peel on the corpus AND is at fixpoint inside the budget") {
    val n = graft.Tables.documents(spark, sf).count()
    val nodes = (0L until n).toSeq
    val edges = nodes.flatMap { id =>
      Seq((id * 2654435761L) % n, (id % 100L) % n, (id / 7L) % n)
        .filter(_ != id).map(d => (math.min(id, d), math.max(id, d)))
    }.distinct
    val truth = peelCoreness(nodes, edges)
    val atBudget = hIter(nodes, edges, Coreness.Rounds)
    val oneMore = hIter(nodes, edges, Coreness.Rounds + 1)
    assert(atBudget == oneMore, "budget must sit at the fixpoint on the gate corpus")
    assert(atBudget == truth, "converged H-iteration must equal true coreness")
    val got = SparkEntry.queries("graph_coreness")(spark, sf).collect()
    assert(got.length == n)
    got.foreach { r =>
      assert(r.getLong(2) == truth(r.getLong(0)),
        s"node ${r.getLong(0)}: coreness ${r.getLong(2)} != ${truth(r.getLong(0))}")
    }
  }

  test("family consistency: graph_kcore's 3-core membership IS coreness >= 3") {
    // two independent implementations of the same mathematics — fixed-k
    // synchronous peeling vs the H-index iteration — must agree exactly
    // on the shared corpus graph, or one of them is wrong
    val core3 = SparkEntry.queries("graph_kcore")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val coreness = SparkEntry.queries("graph_coreness")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(core3.keySet == coreness.keySet && core3.nonEmpty)
    core3.foreach { case (node, inCore) =>
      assert(inCore == (coreness(node) >= KCore.CoreK),
        s"node $node: kcore says $inCore, coreness says ${coreness(node)}")
    }
  }

  private def runOn(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val rows = Coreness.corenessOf(spark, nodes.toDF("doc_id"), edges.toDF("u", "v"))
      .collect()
    rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("converged flag goes false on a path deeper than the budget (truncation is visible)") {
    // H-corrections propagate one hop per round: on a 24-node path the
    // endpoint '1' reaches ~8 hops in by round 8, so interior nodes still
    // read the degree bound 2 — and the nodes whose score moved between
    // rounds 7 and 8 must carry converged=false. The flag must match the
    // driver replica EXACTLY (it is the same mathematics), and the
    // all-true certificate must NOT hold here.
    val nodes = (0L until 24L).toSeq
    val edges = (0L until 23L).map(i => (i, i + 1L))
    val h7 = hIter(nodes, edges, Coreness.Rounds - 1)
    val h8 = hIter(nodes, edges, Coreness.Rounds)
    val rows = Coreness.corenessOf(spark, nodes.toDF("doc_id"), edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    nodes.foreach { v =>
      assert(rows(v)._1 == h8(v), s"node $v value: ${rows(v)._1} != ${h8(v)}")
      assert(rows(v)._2 == (h7(v) == h8(v)), s"node $v converged flag mismatch")
    }
    assert(rows.values.exists(!_._2), "a 24-node path must NOT certify convergence in 8 rounds")
    assert(rows.values.exists { case (c, conv) => c > 1L && conv },
      "per-node last-step stability is necessary-not-sufficient: some stale interior " +
        "node reads 2 with a locally-quiet flag — only the GLOBAL all-true certifies")
    // and the corpus gate graph DOES certify: every row converged=true
    val corpus = graft.SparkEntry.queries("graph_coreness")(spark, sf).collect()
    assert(corpus.forall(_.getBoolean(3)), "gate corpus must be fully converged at budget")
  }

  test("planted topologies pin the textbook core numbers") {
    // K4 {0,1,2,3} with tail 3—4: clique coreness 3, tail 1; isolated 9: 0
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val got = runOn(Seq(0L, 1L, 2L, 3L, 4L, 9L), k4)
    assert(Seq(0L, 1L, 2L).forall(got(_)._2 == 3L), s"clique nodes: $got")
    assert(got(3L) == ((4L, 3L)), "tail attachment keeps clique coreness but degree 4")
    assert(got(4L)._2 == 1L && got(9L) == ((0L, 0L)))
    // star: center degree 4 but coreness 1 (degree is gameable, coreness is not)
    val star = runOn(Seq(0L, 1L, 2L, 3L, 4L),
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert(star(0L) == ((4L, 1L)), s"star center: ${star(0L)}")
    // two disjoint triangles: all coreness 2
    val tri = runOn(0L to 5L,
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L)))
    assert(tri.values.forall(_._2 == 2L), s"triangles: $tri")
  }
}
