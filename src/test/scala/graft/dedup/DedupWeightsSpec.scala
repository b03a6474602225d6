package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `dedup_weights` contract: full-corpus coverage, exactly one keeper per
  * cluster, sizes partition |corpus|, and the clustered subset agrees
  * with `dedup_clusters` row for row. */
class DedupWeightsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("covers the corpus; one keeper per cluster; sizes partition n") {
    val n = graft.Tables.documents(spark, sf).count()
    val rows = SparkEntry.queries("dedup_weights")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length.toLong == n, "every document weighted")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (canonical, members) =>
      assert(members.count(_._4) == 1, s"cluster $canonical: exactly one keeper")
      assert(members.find(_._4).get._1 == canonical, "the keeper IS the canonical")
      assert(members.forall(_._3 == members.length.toLong), "csize = |cluster|")
      assert(canonical == members.map(_._1).min, "canonical is the min doc_id")
    }
    assert(byCluster.values.map(_.length.toLong).sum == n)
  }

  test("clustered subset equals dedup_clusters") {
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weights = SparkEntry.queries("dedup_weights")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    clusters.foreach { case (doc, canonical) =>
      assert(weights(doc)._1 == canonical)
      assert(weights(doc)._2 >= 2L, "clustered docs sit in clusters of >= 2")
    }
    // non-clustered docs are singletons
    (weights.keySet -- clusters.keySet).foreach { doc =>
      assert(weights(doc) == (doc, 1L), s"doc $doc must be its own singleton")
    }
  }
}
