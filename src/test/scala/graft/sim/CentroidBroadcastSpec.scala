package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The centroid matrix must survive growing past a codegen literal: above
  * `spark.graft.centroid.maxLiteralDoubles` the assignment ships the
  * matrix as a broadcast RELATION (the MLlib model-shipping shape) instead
  * of a `typedlit` plan constant. Forcing the threshold to 0 exercises the
  * large-K path at test scale; outputs must be IDENTICAL to the literal
  * path on every consumer, and the plan must show the broadcast exchange
  * with no giant literal. */
class CentroidBroadcastSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def withForcedBroadcast[T](body: => T): T = {
    spark.conf.set(CentroidAssign.ConfKey, "0")
    try body finally spark.conf.unset(CentroidAssign.ConfKey)
  }

  private def rows(name: String): Seq[String] = {
    val out = SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    graft.CacheRegistry.releaseAll()
    out
  }

  Seq("emb_kmeans", "emb_incremental_assign", "ann_ivf", "ann_ivfpq", "dedup_semantic")
    .foreach { name =>
      test(s"$name: broadcast-relation path output is identical to the literal path") {
        val literal = rows(name)
        val bcast = withForcedBroadcast(rows(name))
        assert(bcast == literal)
        assert(literal.nonEmpty)
      }
    }

  test("large-K path plans a broadcast exchange, not a centroid plan literal") {
    val plan = withForcedBroadcast {
      val p = SparkEntry.queries("ann_ivf")(spark, sf).queryExecution.executedPlan.toString
      graft.CacheRegistry.releaseAll()
      p
    }
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      "centroids must ship as a broadcast relation on the large-K path")
    // the literal path folds the matrix into the plan text as a [[...],[...]]
    // constant of 64-double rows — its absence is the point of this path
    assert(!plan.contains("0.1,"), s"no inline centroid matrix expected")
  }

  test("literal path still plans WITHOUT any broadcast fan-out of the fact") {
    val p = SparkEntry.queries("emb_kmeans")(spark, sf).queryExecution.executedPlan.toString
    graft.CacheRegistry.releaseAll()
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "under the threshold the assignment stays a compiled map-side literal")
  }
}
