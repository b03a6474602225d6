package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `graph_betweenness` — textbook anchors where the pivot estimator is
  * EXACT (every node a pivot, unique shortest paths: the path's interior
  * gradient, the star center's (n−1)(n−2), the clique's uniform zero)
  * plus an exact driver replay of the K-pivot bounded Brandes chain on
  * the corpus graph. */
class BetweennessSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Betweenness.betweennessOf(spark, nodes.toDF("doc_id"), edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Independent driver replica: K-pivot, MaxHops-bounded Brandes with
    * integer-millionth truncated accumulation — the same mathematics
    * re-derived from Brandes 2001 directly. */
  private def replay(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val pivots = nodes.sorted.take(Betweenness.K)
    val acc = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (s <- pivots) {
      // forward BFS with path counts
      val dist = collection.mutable.Map(s -> 0)
      val sigma = collection.mutable.Map(s -> 1L)
      var frontier = Set(s)
      for (d <- 1 to Betweenness.MaxHops) {
        val next = collection.mutable.Map.empty[Long, Long]
        for (v <- frontier; w <- adj.getOrElse(v, Set.empty) if !dist.contains(w))
          next(w) = next.getOrElse(w, 0L) + sigma(v)
        next.foreach { case (w, sg) => dist(w) = d; sigma(w) = sg }
        frontier = next.keySet.toSet
      }
      // backward truncated-integer accumulation
      val delta = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (d <- (Betweenness.MaxHops - 1) to 1 by -1;
           v <- dist.collect { case (n, dd) if dd == d => n }) {
        val terms = adj.getOrElse(v, Set.empty).toSeq
          .filter(w => dist.get(w).contains(d + 1))
          .map(w => sigma(v) * (Betweenness.Scale + delta(w)) / sigma(w))
        if (terms.nonEmpty) { delta(v) = terms.sum; acc(v) += terms.sum }
      }
    }
    nodes.map(n => n -> acc(n)).toMap
  }

  test("P5 path: interior brokerage gradient 0/6/8/6/0 (exact — all nodes pivots, unique paths)") {
    val nodes = (0L to 4L).toSeq
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val bc = run(nodes, edges)
    val M = Betweenness.Scale
    assert(bc == Map(0L -> 0L, 1L -> 6 * M, 2L -> 8 * M, 3L -> 6 * M, 4L -> 0L),
      s"P5 ordered-pair betweenness: $bc")
    assert(bc == replay(nodes, edges))
  }

  test("star: the center carries ALL brokerage (n-1)(n-2); leaves none") {
    val nodes = (0L to 4L).toSeq
    val edges = (1L to 4L).map(l => (0L, l))
    val bc = run(nodes, edges)
    assert(bc(0L) == 12 * Betweenness.Scale, s"star center: ${bc(0L)}")
    (1L to 4L).foreach(l => assert(bc(l) == 0L, s"leaf $l must broker nothing"))
    assert(bc == replay(nodes, edges))
  }

  test("clique: every shortest path is a direct edge — betweenness uniformly zero") {
    val nodes = (0L to 3L).toSeq
    val edges = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val bc = run(nodes, edges)
    assert(bc.values.forall(_ == 0L), s"clique: $bc")
  }

  test("sigma is genuinely counted: C4 splits each opposite-pair dependency over two equal paths") {
    // the 4-cycle 0-1-3-2-0: every opposite pair (0,3) and (1,2) has TWO
    // shortest paths, so each intermediate carries sigma_v/sigma_w = 1/2
    // of the unit per direction — 2 × 500000 millionths each, exact
    val nodes = (0L to 3L).toSeq
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    val bc = run(nodes, edges)
    val M = Betweenness.Scale
    assert(bc.values.forall(_ == M), s"C4 symmetry: every node brokers exactly 1.0: $bc")
    assert(bc == replay(nodes, edges))
  }

  test("corpus: engine output equals the first-principles driver replay exactly") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val edges = Triangles.simpleEdges(
        graft.Tables.documents(spark, sf).select("doc_id"), docs.length.toLong)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rep = replay(docs, edges)
    val out = graft.SparkEntry.queries("graph_betweenness")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == docs.toSet)
    docs.foreach(d => assert(out(d) == rep(d), s"node $d: engine ${out(d)} != replica ${rep(d)}"))
    assert(out.values.exists(_ > 0L), "corpus graph must show non-trivial brokerage")
  }
}
