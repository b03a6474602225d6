package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The staged graph-ladder contract (r13 verdict task #1): the 16-operator
  * family shares ONE materialization of the citation graph per (corpus,
  * fingerprint) — the distinct edge shuffle runs once per session, not once
  * per operator — with the same supersede-eviction lifecycle as the dedup
  * ladder, and rung contents exactly equal to the edge definitions the
  * operators previously derived inline. */
class GraphStagedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def checkpointRddId(df: DataFrame): Int =
    df.queryExecution.logical.collect { case lr: LogicalRDD => lr.rdd.id }.head

  private def writeDocs(dir: String, n: Int): Unit = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"doc $i text", "en", "synth", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("one materialization per fingerprint, shared by every consumer; ladder internally consistent") {
    val dir = java.nio.file.Files.createTempDirectory("graph_rung").toString
    writeDocs(dir, 30)
    val se1 = GraphArtifacts.stagedSimpleEdges(spark, dir)
    // same fingerprint → the staged frame ITSELF: a second operator pays
    // zero recompute (this is the 16×-shuffle elimination)
    assert(GraphArtifacts.stagedSimpleEdges(spark, dir) eq se1)
    val adj = GraphArtifacts.stagedAdjacency(spark, dir)
    assert(GraphArtifacts.stagedAdjacency(spark, dir) eq adj)
    // ladder consistency: adjacency = both directions of the simple edges;
    // citation = out-degree exactly 3
    val n = GraphArtifacts.stagedVertices(spark, dir).count()
    assert(n == 30)
    assert(GraphArtifacts.stagedCitation(spark, dir).count() == 3 * n)
    assert(adj.count() == 2 * se1.count())
    // rung contents ≡ the inline definition the operators used before
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"))
    val inline = Triangles.simpleEdges(docs, n)
    assert(se1.exceptAll(inline).count() == 0 && inline.exceptAll(se1).count() == 0,
      "staged rung must equal the inline simple-edge definition row-for-row")
    val dirSimple = GraphArtifacts.stagedDirectedSimple(spark, dir)
    val inlineDir = Scc.directedEdges(docs, n)
    assert(dirSimple.exceptAll(inlineDir).count() == 0 &&
      inlineDir.exceptAll(dirSimple).count() == 0)
    GraphArtifacts.clearGraphCache()
  }

  test("corpus rewrite supersedes: recompute on the new fingerprint, stale blocks evicted") {
    val dir = java.nio.file.Files.createTempDirectory("graph_rung_evict").toString
    writeDocs(dir, 12)
    val v1 = GraphArtifacts.stagedAdjacency(spark, dir)
    val v1Id = checkpointRddId(v1)
    assert(spark.sparkContext.getPersistentRDDs.contains(v1Id))
    val c1 = v1.count()
    writeDocs(dir, 25) // rewrite: more docs → more edges
    val v2 = GraphArtifacts.stagedAdjacency(spark, dir)
    assert(!(v2 eq v1), "rewritten corpus must re-stage")
    assert(v2.count() > c1, "staged adjacency must reflect the new corpus")
    assert(!spark.sparkContext.getPersistentRDDs.contains(v1Id),
      "stale rung checkpoint must be unpersisted on supersede")
    // explicit invalidation releases the family
    val v2Id = checkpointRddId(v2)
    GraphArtifacts.clearGraphCache()
    assert(!spark.sparkContext.getPersistentRDDs.contains(v2Id))
  }

  test("two operators over the rung agree with each other on the shared graph") {
    val dir = java.nio.file.Files.createTempDirectory("graph_rung_ops").toString
    writeDocs(dir, 20)
    // triangles' degree column and coreness' degree column both read the
    // staged graph — a desynchronized rung would make them disagree
    val t = Triangles.queries("graph_triangles")(spark, dir)
      .select(col("doc_id"), col("degree")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = Coreness.queries("graph_coreness")(spark, dir)
      .select(col("doc_id"), col("degree")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == c, "per-node degree must be identical across rung consumers")
    graft.CacheRegistry.releaseAll()
    GraphArtifacts.clearGraphCache()
  }
}
