package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `graph_scc` contract: the fixed-budget FW-BW coloring equals an exact
  * driver-side Tarjan (min-member labels) on the real corpus graph — the
  * convergence-inside-budget witness — and planted topologies pin the two
  * textbook behaviors: a 2-cycle settles as one SCC under its minimum
  * member, and a feed-forward chain (the budget family's known serial
  * pathology) peels one root per outer round yet still settles fully
  * inside the shipped budget. */
class SccSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  /** Exact SCC, iterative Tarjan, labels = min member. */
  private def tarjan(ids: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, g) => k -> g.map(_._2) }
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStk = scala.collection.mutable.Set.empty[Long]
    val stk = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    for (s0 <- ids if !index.contains(s0)) {
      val work = scala.collection.mutable.ArrayBuffer((s0, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.last
        if (pi == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stk += v; onStk += v
        }
        val nbrs = adj.getOrElse(v, Seq.empty)
        var i = pi
        var recursed = false
        while (i < nbrs.length && !recursed) {
          val w = nbrs(i)
          if (!index.contains(w)) {
            work(work.length - 1) = (v, i + 1)
            work += ((w, 0))
            recursed = true
          } else {
            if (onStk(w)) low(v) = math.min(low(v), index(w))
            i += 1
          }
        }
        if (!recursed) {
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer.empty[Long]
            var done = false
            while (!done) {
              val w = stk.remove(stk.length - 1); onStk -= w; comp += w
              if (w == v) done = true
            }
            val m = comp.min
            comp.foreach(w => out(w) = m)
          }
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val (u, _) = work.last
            low(u) = math.min(low(u), low(v))
          }
        }
      }
    }
    out.toMap
  }

  test("budget FW-BW equals exact Tarjan (min-member labels) on the corpus graph, fully settled") {
    val n = graft.Tables.documents(spark, sf).count()
    val ids = (0L until n).toSeq
    val edges = ids.flatMap { id =>
      Seq((id * 2654435761L) % n, (id % 100L) % n, (id / 7L) % n)
        .filter(_ != id).map(d => (id, d))
    }.distinct
    val exact = tarjan(ids, edges)
    val got = SparkEntry.queries("graph_scc")(spark, sf).collect()
    graft.CacheRegistry.releaseAll()
    assert(got.length == n)
    val exactSizes = exact.values.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    got.foreach { r =>
      val (doc, sccId, settled, size) =
        (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))
      assert(settled, s"doc $doc unsettled inside the shipped budget")
      assert(sccId == exact(doc), s"doc $doc: scc $sccId != Tarjan ${exact(doc)}")
      assert(size == exactSizes(sccId), s"scc $sccId size $size != ${exactSizes(sccId)}")
    }
  }

  private def runOn(verts: Seq[Long], edges: Seq[(Long, Long)]) = {
    val rows = Scc.sccOf(spark, verts.toDF("doc_id"), edges.toDF("u", "v"))
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    graft.CacheRegistry.releaseAll()
    rows
  }

  test("planted 2-cycle + feed-forward chain: cycle settles under its min member, chain peels to singletons") {
    // 10⇄20 is the genuine citation ring; 30→40→50→10 is a one-way chain
    // INTO it — mutual reachability separates them even though the whole
    // graph is weakly connected (graph_components would merge all five).
    val got = runOn(Seq(10L, 20L, 30L, 40L, 50L),
      Seq((10L, 20L), (20L, 10L), (30L, 40L), (40L, 50L), (50L, 10L)))
    assert(got(10L) == ((10L, true, 2L)) && got(20L) == ((10L, true, 2L)))
    assert(got(30L) == ((30L, true, 1L)))
    assert(got(40L) == ((40L, true, 1L)))
    assert(got(50L) == ((50L, true, 1L)))
  }

  test("two disjoint cycles stay separate SCCs; an isolated vertex is its own singleton") {
    val got = runOn(Seq(1L, 2L, 3L, 7L, 8L, 9L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 7L)))
    assert(got(1L) == ((1L, true, 3L)) && got(2L) == ((1L, true, 3L)) &&
      got(3L) == ((1L, true, 3L)))
    assert(got(7L) == ((7L, true, 2L)) && got(8L) == ((7L, true, 2L)))
    assert(got(9L) == ((9L, true, 1L)))
  }
}
