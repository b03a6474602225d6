package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KmeansSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("kmeans assigns every vector to a valid cluster, deterministically") {
    val a = Kmeans.embKmeans(spark, sf).collect()
    val b = Kmeans.embKmeans(spark, sf).collect()
    assert(a.length == graft.Tables.embeddings(spark, sf).count())
    assert(a.forall { r =>
      val c = r.getLong(1); c >= 0 && c < Kmeans.kFor(a.length)
    })
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "must be run-to-run deterministic")
    assert(a.map(_.getLong(1)).distinct.length > 1, "more than one cluster must survive")
  }

  test("outlier flags mark exactly the bottom tail of the score order") {
    val rows = Kmeans.outlierFlags(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val n = rows.length
    val expectFlagged = n * Kmeans.OutlierPct / 100
    val flagged = rows.filter(_._3)
    assert(flagged.length == expectFlagged,
      s"${flagged.length} flagged, expected $expectFlagged of $n")
    // the flagged set IS the bottom of the (score, id) order — every
    // flagged score ≤ every kept score, ties broken by id
    val sorted = rows.sortBy(r => (r._2, r._1))
    assert(sorted.take(expectFlagged.toInt).forall(_._3))
    assert(sorted.drop(expectFlagged.toInt).forall(!_._3))
  }

  test("Lloyd iterations improve mean cosine-to-centroid over the init assignment") {
    def meanCos(iters: Int): Double = {
      val rows = Kmeans.run(spark, sf, iters).collect()
      rows.map(_.getDouble(2)).sum / rows.length
    }
    val init = meanCos(0)
    val trained = meanCos(Kmeans.Iters)
    assert(trained > init, s"mean cos after ${Kmeans.Iters} iters ($trained) must beat init ($init)")
  }

  test("semantic dedup covers every vector and actually drops near-dups") {
    val rows = Kmeans.semanticDedup(spark, sf).collect()
    assert(rows.length == graft.Tables.embeddings(spark, sf).count())
    val dropped = rows.count(!_.getBoolean(2))
    assert(dropped > 0, "the corpus has planted near-dups; some must be dropped")
    assert(dropped < rows.length / 2, "dropping half the corpus would mean a broken threshold")
  }

  test("K scales with corpus size: √n growth, oracle pin at the verify SF") {
    // the oracle replays kFor via a scalar subquery; at the floor corpus
    // the formula must land exactly on the minimum
    assert(Kmeans.kFor(500) == Kmeans.MinK)
    assert(AnnIvf.cellsFor(500) == AnnIvf.MinCells)
    // √n scaling: 100× the corpus ≈ 10× the clusters (within rounding)
    assert(Kmeans.kFor(2000) == 16)
    assert(Kmeans.kFor(50000) == 80)
    assert(Kmeans.kFor(5000000) == 791)
    assert(AnnIvf.cellsFor(2000) == 32)
    assert(AnnIvf.cellsFor(200000) == 317)
    // monotone
    val ks = Seq(500L, 5000L, 50000L, 500000L).map(Kmeans.kFor)
    assert(ks == ks.sorted && ks.distinct == ks)
  }

  test("per-cluster pair mass stays bounded as the corpus grows (two SFs)") {
    // Σ cᵢ² is the within-cluster pair work SemDeDup does; with K ∝ √n it
    // must grow far slower than n². Compare the 500-vector and 2000-vector
    // corpora: pair mass may grow ~n^1.5, i.e. ≤ 8× here, not 16× (=n²).
    def pairMass(dir: String): (Long, Long) = {
      val sizes = Kmeans.assignments(spark, dir)
        .groupBy("cluster").count().collect().map(_.getLong(1))
      (sizes.sum, sizes.map(c => c * c).sum)
    }
    val (n1, m1) = pairMass("/root/testdata/sf0.001")
    val (n2, m2) = pairMass("/root/testdata/sf0.1")
    assert(n1 == 500 && n2 == 2000)
    val quadratic = (n2.toDouble / n1) * (n2.toDouble / n1) // 16×
    val actual = m2.toDouble / m1
    assert(actual < quadratic * 0.75,
      s"pair mass must scale sub-quadratically: grew ${actual}× vs quadratic ${quadratic}×")
  }

  test("an in-place same-size rewrite of the corpus retrains the model") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_kmeans_fp").toString
    def write(seed: Double): Unit =
      spark.range(40).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(Kmeans.Dim)),
          d => sin(col("id") * d.cast("double") * seed)).as("embedding"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    write(0.37)
    val before = Kmeans.embKmeans(spark, dir).collect().map(_.toString).toSeq
    // same path, same row count, same byte-ish size — only the values move
    write(0.61)
    val after = Kmeans.embKmeans(spark, dir).collect().map(_.toString).toSeq
    assert(before != after,
      "rewritten data at the same path must retrain centroids, not serve the stale model")
  }

  test("empty corpus: the kmeans family returns schema-complete empty frames") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kmeans_empty").toString
    graft.Tables.embeddings(spark, sf).limit(0)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val km = Kmeans.embKmeans(spark, dir)
    assert(km.columns.toSeq == Seq("vec_id", "cluster", "cos_center") && km.count() == 0)
    assert(Kmeans.semanticDedup(spark, dir).count() == 0)
    assert(AnnIvf.annTopkIvf(spark, dir).count() == 0)
  }

  test("incremental assign covers exactly the batch with history-stable clusters") {
    val all = graft.Tables.embeddings(spark, sf)
    val maxId = all.agg(org.apache.spark.sql.functions.max("vec_id")).head.getLong(0)
    val split = (maxId + 1) * 4 / 5
    val rows = Kmeans.incrementalAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == (maxId - split + 1), "one row per batch vector")
    assert(rows.forall(_._1 >= split), "history vectors must not re-assign")
    val kHist = Kmeans.kFor(split)
    assert(rows.forall(r => r._2 >= 0 && r._2 < kHist),
      s"clusters must come from the history-trained model (K=$kHist)")
    // deterministic (memoized model + deterministic assignment)
    val again = Kmeans.incrementalAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("tiny corpora below the K/cell floor train on every vector, no throw") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_kmeans_tiny").toString
    // 9 embeddings: history split = 7 < MinK = 8 — the model trains with
    // all 7 history vectors (as the oracle's WHERE vec_id < kSql does)
    spark.range(9).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(Kmeans.Dim)),
        d => sin(col("id") * d.cast("double") * 0.31)).as("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val inc = Kmeans.incrementalAssign(spark, dir).collect()
    assert(inc.map(_.getLong(0)).toSeq == Seq(7L, 8L), "the 2-vector batch is assigned")
    assert(inc.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 7), "clusters from the 7-vector model")
    assert(Kmeans.embKmeans(spark, dir).count() == 9)
    val _ = AnnIvf.annTopkIvf(spark, dir).collect() // no throw is the contract
  }

  test("assignment is map-side: no join anywhere in the final plan") {
    val p = Kmeans.embKmeans(spark, sf).queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("join"), "assignment must be a broadcast-literal projection")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }
}
