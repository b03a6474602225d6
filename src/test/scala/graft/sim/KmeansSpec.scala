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
      val c = r.getLong(1); c >= 0 && c < Kmeans.K
    })
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "must be run-to-run deterministic")
    assert(a.map(_.getLong(1)).distinct.length > 1, "more than one cluster must survive")
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

  test("assignment is map-side: no join anywhere in the final plan") {
    val p = Kmeans.embKmeans(spark, sf).queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("join"), "assignment must be a broadcast-literal projection")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }
}
