package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `ann_graph_search` contract: structural invariants of the search
  * output, the beam's escape from the probe's own neighbor list (the
  * reason the operator exists), recall ordering vs both the direct
  * graph-list read and the pure greedy walk, and the staged-rung read. */
class AnnGraphSearchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("structure: no self-hits, contiguous ranks ordered by (cosine desc, id), <= 10 per probe") {
    val g = AnnGraphSearch.queries("ann_graph_search")(spark, sf).collect()
    graft.CacheRegistry.releaseAll()
    assert(g.nonEmpty)
    assert(g.forall(r => r.getLong(0) != r.getLong(1)), "self-hit found")
    assert(g.forall(_.getLong(0) < 10), "only probe rows")
    g.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getLong(2))
      assert(byRank.map(_.getLong(2)).toSeq == (1L to rows.length.toLong),
        s"q=$q ranks not contiguous")
      val order = byRank.map(r => (-r.getDouble(3), r.getLong(1))).toSeq
      assert(order == order.sorted, s"q=$q not in (cosine desc, id) order")
      assert(rows.length <= AnnGraphSearch.OutK)
      assert(rows.map(_.getLong(1)).distinct.length == rows.length, s"q=$q duplicate hit")
    }
  }

  test("corpus recall: search >= direct graph-list read (escapes the 0.8 ceiling) and >= pure greedy") {
    val eval = graft.SparkEntry.queries("ann_recall_eval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(2)))
    graft.CacheRegistry.releaseAll()
    def recallOf(m: String): Double = {
      val rows = eval.filter(_._1 == m)
      rows.map(_._2).sum.toDouble / rows.map(_._3).sum
    }
    val search = recallOf("graphsearch")
    val direct = recallOf("knngraph")
    assert(search >= direct,
      s"beam search must not lose to reading the 8-entry list: $search vs $direct")
    assert(search > 0.8, s"search must escape the k=8 list's recall@10 ceiling: $search")
    // greedy (ef=1) emits at most the single best node per probe — the
    // published beam width dominates it by construction and in measure
    val greedy = AnnGraphSearch.searchWith(spark, sf, 1)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val beam = AnnGraphSearch.queries("ann_graph_search")(spark, sf)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    val exact = SimQueries.queries("ann_topk_brute")(spark, sf)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    val rBeam = beam.intersect(exact).size.toDouble / exact.size
    val rGreedy = greedy.intersect(exact).size.toDouble / exact.size
    assert(rBeam >= rGreedy, s"beam must not lose to greedy: $rBeam vs $rGreedy")
    AnnKnnGraph.clearKnnCache()
    SimArtifacts.clearBandCache()
  }

  test("planted wide cluster: the walk reaches true neighbors OUTSIDE the probe's own 8-list") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gsearch").toString
    // a 13-point ARC (cosine decays with index distance, distinct at
    // round-4) + 20 orthogonal far vectors: probe 0's exact top-10 are
    // arc members 1..10, but its published graph list holds only K=8
    // (1..8) — the beam walk must pick up 9 and 10 through node 8's list
    def near(i: Int): Seq[Double] = {
      val th = 0.03 * i
      Seq(math.cos(th), math.sin(th)) ++ Seq.fill(6)(0.0)
    }
    def far(i: Int): Seq[Double] =
      Seq.tabulate(8)(d => if (d == 2 + i % 6) 1.0 else 0.0)
    val rows = (0 until 13).map(i => (i.toLong, near(i))) ++
      (13 until 33).map(i => (i.toLong, far(i)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val hits = AnnGraphSearch.queries("ann_graph_search")(spark, dir)
      .filter(col("q_id") === 0).collect().map(_.getLong(1)).toSet
    val list0 = AnnKnnGraph.queries("ann_knn_graph")(spark, dir)
      .filter(col("q_id") === 0).collect().map(_.getLong(1)).toSet
    graft.CacheRegistry.releaseAll()
    AnnKnnGraph.clearKnnCache()
    SimArtifacts.clearBandCache()
    assert(list0 == (1L to 8L).toSet, s"probe 0's own list is its 8 arc neighbors: $list0")
    assert(hits == (1L to 10L).toSet,
      s"search must fill the exact top-10 — 9 and 10 only reachable via the walk: $hits")
  }
}
