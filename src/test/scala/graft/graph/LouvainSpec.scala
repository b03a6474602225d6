package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `graph_louvain` contract: (1) planted topologies land the textbook
  * splits, converged, where synchronous LPA oscillates; (2) the ascent's
  * corpus-graph modularity is >= `graph_labelprop`'s, audited through the
  * REGISTERED `graph_modularity` scorer — communities that OPTIMIZE the
  * quantity the scorer only scores. */
class LouvainSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def runBoth(edges: Seq[(Long, Long)], n: Long) = {
    val docs = Seq.range(0L, n).toDF("doc_id")
    val und = edges.toDF("u", "v")
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .unionByName(und.select(col("v").as("node"), col("u").as("nb")))
      .localCheckpoint(true)
    val lv = Louvain.louvainOf(spark, docs, adj).collect()
    val lp = LabelProp.propagate(docs, adj, preMaterialized = true).collect()
    graft.CacheRegistry.releaseAll()
    (lv.map(r => r.getLong(0) -> r.getLong(1)).toMap,
      lv.forall(_.getBoolean(3)),
      lp.map(r => r.getLong(0) -> r.getLong(1)).toMap,
      lp.forall(_.getBoolean(3)))
  }

  test("two-clique bridge: louvain lands the clique split, converged") {
    val k4a = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L))
    val k4b = Seq((4L,5L),(4L,6L),(4L,7L),(5L,6L),(5L,7L),(6L,7L))
    val (lv, conv, _, _) = runBoth(k4a ++ k4b ++ Seq((3L, 4L)), 8L)
    assert(conv, "barbell must converge")
    val left = Set(0L, 1L, 2L, 3L).map(lv)
    val right = Set(4L, 5L, 6L, 7L).map(lv)
    assert(left.size == 1 && right.size == 1 && left != right,
      s"cliques must form two communities: $lv")
  }

  test("even cycles: synchronous LPA oscillates (its declared weakness); louvain converges") {
    // C4: the textbook bipartite oscillation — LPA flips parity classes
    // forever and reports converged=false; the parity-scheduled ascent
    // settles on a stable co-optimal partition
    val (lvC4, convC4, lpC4, lpConvC4) = runBoth(Seq((0L,1L),(1L,2L),(2L,3L),(0L,3L)), 4L)
    assert(convC4, s"louvain must converge on C4: $lvC4")
    assert(!lpConvC4, "LPA honestly flags its C4 oscillation (the weakness louvain closes)")
    assert(lpC4(0L) != lpC4(1L) && lpC4(0L) == lpC4(2L),
      "LPA's C4 end-state is the parity mislabel")
    // C6: same story, and louvain's split has strictly positive modularity
    val (lvC6, convC6, _, lpConvC6) = runBoth(
      Seq((0L,1L),(1L,2L),(2L,3L),(3L,4L),(4L,5L),(0L,5L)), 6L)
    assert(convC6 && !lpConvC6)
    assert(Seq(lvC6(0L), lvC6(1L), lvC6(2L)).distinct.size == 1 &&
      Seq(lvC6(3L), lvC6(4L), lvC6(5L)).distinct.size == 1 &&
      lvC6(0L) != lvC6(3L),
      s"C6 must split into the two arcs (Q = 1/6 > 0): $lvC6")
  }

  test("two-triangle bridge (the synchronous-swap motif the coloring schedule exists for)") {
    val (lv, conv, _, _) = runBoth(
      Seq((0L,1L),(1L,2L),(0L,2L),(3L,4L),(4L,5L),(3L,5L),(2L,3L)), 6L)
    assert(conv, "must converge (unguarded synchronous moves swap forever here)")
    assert(Set(0L,1L,2L).map(lv).size == 1 && Set(3L,4L,5L).map(lv).size == 1 &&
      lv(0L) != lv(3L), s"triangles must split: $lv")
  }

  test("corpus audit: louvain's modularity >= labelprop's through the registered scorer") {
    val sf = TestSpark.sf
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val edges = Triangles.simpleEdges(docs, n).localCheckpoint(true)
    def q(comm: org.apache.spark.sql.DataFrame): Double = {
      val v = Modularity.modularityOf(edges, comm).collect()(0).getAs[Double]("modularity")
      graft.CacheRegistry.releaseAll()
      v
    }
    val lv = q(Louvain.queries("graph_louvain")(spark, sf)
      .select(col("doc_id").as("node"), col("community")))
    val lp = q(LabelProp.queries("graph_labelprop")(spark, sf)
      .select(col("doc_id").as("node"), col("community")))
    assert(lv >= lp, s"ascent must not lose to propagation: louvain=$lv labelprop=$lp")
    GraphArtifacts.clearGraphCache()
  }

  test("isolated nodes stay their own singleton community") {
    val docs = Seq.range(0L, 4L).toDF("doc_id")
    val adj = Seq((0L, 1L), (1L, 0L)).toDF("node", "nb").localCheckpoint(true)
    val lv = Louvain.louvainOf(spark, docs, adj).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.CacheRegistry.releaseAll()
    assert(lv(0L)._1 == lv(1L)._1 && lv(0L)._2 == 2L, s"pair merges: $lv")
    assert(lv(2L) == ((2L, 1L)) && lv(3L) == ((3L, 1L)), s"isolated stay singleton: $lv")
  }
}
