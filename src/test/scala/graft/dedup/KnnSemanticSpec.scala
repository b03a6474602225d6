package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `dedup_knn_semantic` contract: component semantics over the knn-graph
  * τ-edges (coverage, min-id canonicals, closure), and the operator's
  * reason to exist — a near-dup pair STRADDLING a kmeans-cell boundary is
  * invisible to `dedup_semantic` (different blocks) but identified here
  * through the graph, while in-cell duplicates are dropped by BOTH. */
class KnnSemanticSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("corpus invariants: full coverage, canonical minimality and closure, edges respected") {
    val out = KnnSemantic.queries("dedup_knn_semantic")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val g = graft.sim.AnnKnnGraph.queries("ann_knn_graph")(spark, sf)
      .filter(col("cosine") >= KnnSemantic.Tau)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val nVec = graft.Tables.embeddings(spark, sf).count()
    graft.CacheRegistry.releaseAll()
    assert(out.size.toLong == nVec, "every vector gets a verdict (singletons included)")
    out.foreach { case (v, (c, kept)) =>
      assert(c <= v, s"canonical must be the component min: $v -> $c")
      assert(out(c)._1 == c, s"canonical must be its own canonical: $c -> ${out(c)._1}")
      assert(kept == (v == c), s"kept is exactly is-canonical: $v")
    }
    g.foreach { case (a, b) =>
      assert(out(a)._1 == out(b)._1,
        s"τ-edge endpoints must share a component: $a(${out(a)._1}) ~ $b(${out(b)._1})")
    }
    assert(out.values.exists(!_._2), "the corpus has duplicate mass to drop")
    graft.sim.AnnKnnGraph.clearKnnCache()
    graft.sim.SimArtifacts.clearBandCache()
  }

  test("planted cell-boundary pair: caught here, invisible to dedup_semantic's blocking") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("knnsem").toString
    // 8 orthogonal seed directions (kmeans MinK=8 inits from ids 0-7),
    // one satellite per seed (ids 8-15, in-cell duplicates), and a
    // STRADDLE pair (16 at 40°, 17 at 50° in the e0-e1 plane): cells
    // split them down the diagonal, but cos(16,17)=cos(10°)≈0.985 — a
    // near-dup pair no within-cell comparison can ever see
    // 64-dim vectors: the kmeans family's Dim contract
    def unit(d: Int): Seq[Double] = Seq.tabulate(64)(i => if (i == d) 1.0 else 0.0)
    def sat(d: Int): Seq[Double] =
      Seq.tabulate(64)(i => if (i == d) 0.95 else if (i == (d + 1) % 8) 0.05 else 0.0)
    def arc(deg: Double): Seq[Double] = {
      val th = math.toRadians(deg)
      Seq(math.cos(th), math.sin(th)) ++ Seq.fill(62)(0.0)
    }
    val rows = (0 until 8).map(d => (d.toLong, unit(d))) ++
      (0 until 8).map(d => ((d + 8).toLong, sat(d))) ++
      Seq((16L, arc(40)), (17L, arc(50)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ks = KnnSemantic.queries("dedup_knn_semantic")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val ds = graft.sim.Kmeans.queries("dedup_semantic")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    graft.CacheRegistry.releaseAll()
    graft.sim.AnnKnnGraph.clearKnnCache()
    graft.sim.SimArtifacts.clearBandCache()
    // the straddle: cell blocking separates 16 and 17 ...
    assert(ds(16L)._1 != ds(17L)._1,
      s"the planted pair must straddle a cell boundary: ${ds(16L)} vs ${ds(17L)}")
    // ... the graph identifies them as duplicates of one canonical
    assert(ks(16L)._1 == ks(17L)._1,
      s"graph dedup must join the straddling pair: ${ks(16L)} vs ${ks(17L)}")
    assert(!ks(17L)._2, "the higher-id straddler drops")
    // agreement away from the boundary: every in-cell satellite duplicate
    // (ids 8-15 vs their seed) is dropped by BOTH methods
    (8L to 15L).foreach { v =>
      assert(!ds(v)._2, s"dedup_semantic must drop satellite $v")
      assert(!ks(v)._2, s"dedup_knn_semantic must drop satellite $v")
    }
  }
}
