package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupClustersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("connected components: chain, triangle, pair resolve to min labels") {
    // chain 1-2-3-4, triangle 10-11-12 (with redundant edge), pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("a_id", "b_id")
    val got = DedupClusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("staged pair graph: reuse equals scratch, and a corpus rewrite invalidates") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("pairstage").toString
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val scratch = DedupQueries.ngramJaccard(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    val staged1 = DedupClusters.verifiedPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    assert(staged1 == scratch, "the staged edge list IS the verified pair set")
    // second consumer must see the SAME materialized frame (no recompute)
    assert(DedupClusters.verifiedPairs(spark, dir) eq DedupClusters.verifiedPairs(spark, dir))

    // rewrite the corpus in place (docs halved): the fingerprint changes,
    // the stage recomputes — serving stale edges here would silently
    // corrupt every downstream cluster/report
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val staged2 = DedupClusters.verifiedPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    assert(staged2 != staged1 || staged1.isEmpty,
      "a rewritten corpus must not be served stale staged pairs")
    staged2.foreach { case (a, b) =>
      assert(a % 2 == 0 && b % 2 == 0, "staged pairs must come from the NEW corpus")
    }
  }

  test("clusters over real near-dup pairs: canonical is the min member and closed under membership") {
    val rows = DedupClusters.clusters(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, canon) => assert(canon <= doc) }
    val members = rows.map(_._1).toSet
    rows.foreach { case (_, canon) => assert(members.contains(canon), s"canonical $canon must itself be clustered") }
  }
}
