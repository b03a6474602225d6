package graft.sim

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `ann_knn_graph` contract: structural invariants of the neighbor graph,
  * recall measured against the exact brute-force k-NN graph, and the
  * NN-descent claim itself — the refinement rounds IMPROVE on the
  * LSH-bucketed round-0 start. */
class AnnKnnGraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def emb = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  /** Exact k-NN graph by brute force — the ground truth. */
  private def bruteKnn(k: Int) = {
    val a = emb.select(col("vec_id").as("q_id"), col("emb").as("a_emb"))
    val b = emb.select(col("vec_id").as("n_id"), col("emb").as("b_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    a.crossJoin(b).filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", round(graft.dedup.DedupQueries.cosine(col("a_emb"), col("b_emb")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"))
  }

  test("structure: no self-loops, contiguous ranks 1..K, ranks ordered by (cosine desc, id)") {
    val g = AnnKnnGraph.queries("ann_knn_graph")(spark, sf).collect()
    graft.CacheRegistry.releaseAll()
    assert(g.nonEmpty)
    assert(g.forall(r => r.getLong(0) != r.getLong(1)), "self-loop found")
    g.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getLong(2))
      assert(byRank.map(_.getLong(2)).toSeq == (1L to rows.length.toLong),
        s"q=$q ranks not contiguous")
      val order = byRank.map(r => (-r.getDouble(3), r.getLong(1))).toSeq
      assert(order == order.sorted, s"q=$q not in (cosine desc, id) order")
      assert(rows.length <= AnnKnnGraph.K)
      assert(rows.map(_.getLong(1)).distinct.length == rows.length, s"q=$q duplicate neighbor")
    }
  }

  test("recall vs brute-force k-NN graph is high, and descent improves on the LSH start") {
    import graft.functions.HashExprs
    HashExprs.register(spark)
    val truth = bruteKnn(AnnKnnGraph.K).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = AnnKnnGraph.queries("ann_knn_graph")(spark, sf)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    // round-0-only baseline: the LSH-bucketed start without descent — the
    // exact same chain with zero refinement rounds, recomputed here
    val e = emb
    val b4 = e.select(col("vec_id"), HashExprs.hyperplaneBands(col("emb")).as("b"))
    val banded = b4.select(col("vec_id"), posexplode(array(
        col("b").getItem(0) * 16 + col("b").getItem(1),
        col("b").getItem(2) * 16 + col("b").getItem(3))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
    val pairs0 = banded.select(col("band"), col("bkey"), col("vec_id").as("a_id"))
      .join(banded.select(col("band"), col("bkey"), col("vec_id").as("b_id")), Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id")).select(col("a_id"), col("b_id")).distinct()
    val s0 = pairs0
      .join(e.select(col("vec_id").as("a_id"), col("emb").as("a_emb")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("emb").as("b_emb")), Seq("b_id"))
      .withColumn("cosine", round(graft.dedup.DedupQueries.cosine(col("a_emb"), col("b_emb")), 4))
    val d0 = s0.select(col("a_id").as("q_id"), col("b_id").as("n_id"), col("cosine"))
      .unionByName(s0.select(col("b_id").as("q_id"), col("a_id").as("n_id"), col("cosine")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    val round0 = d0.withColumn("rank", row_number().over(w)).filter(col("rank") <= AnnKnnGraph.K)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    val recallFull = full.intersect(truth).size.toDouble / truth.size
    val recall0 = round0.intersect(truth).size.toDouble / truth.size
    assert(recallFull >= recall0,
      s"descent must not lose recall: full=$recallFull round0=$recall0")
    assert(recallFull > recall0, // on this corpus the improvement is real
      s"descent must improve the LSH start here: full=$recallFull round0=$recall0")
    assert(recallFull >= 0.85, s"recall vs brute too low: $recallFull (round0=$recall0)")
  }

  test("planted cluster: mutual nearest neighbors find each other regardless of buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("knng").toString
    // two tight clusters far apart + a lone outlier adopted via descent
    def v(base: Double, j: Int): Seq[Double] =
      Seq.tabulate(8)(d => base + (if (d == j % 8) 0.01 * j else 0.0))
    val rows =
      (0 until 6).map(i => (i.toLong, v(1.0, i))) ++
        (6 until 12).map(i => (i.toLong, v(-1.0, i))) :+ (12L, Seq.fill(8)(0.5))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val g = AnnKnnGraph.queries("ann_knn_graph")(spark, dir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.CacheRegistry.releaseAll()
    // every cluster member's nearest neighbor is inside its own cluster
    (0L until 6L).foreach(i => assert(g(i) < 6L, s"vec $i left its cluster: ${g(i)}"))
    (6L until 12L).foreach(i => assert(g(i) >= 6L && g(i) < 12L, s"vec $i: ${g(i)}"))
  }
}
