package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The hot-bucket cap (MinHashLsh.MaxBandBucket) under a degenerate corpus:
  * 5,000 byte-identical boilerplate docs — the regime where an uncapped
  * band self-join detonates into 16 × 5000²/2 ≈ 2·10⁸ candidate pairs in a
  * single bucket. The contract: over-cap buckets are exact-dedup's job
  * (dedup_exact still reports the whole group), the LSH pass keeps serving
  * the genuine near-dup tail, and candidate mass stays LINEAR. */
class LshHotBucketSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val boiler =
    "terms of service apply to all visitors of this site please read " +
      "carefully before continuing to browse the content herein"
  private val nearA =
    "the quick brown fox jumps over the lazy dog near the river bank at dawn every single day without fail"
  private val nearB =
    "the quick brown fox jumps over the lazy dog near the river bank at dusk every single day without fail"
  private val lone =
    "completely unrelated text about spark catalyst optimizer internals and whole stage code generation details"

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("hotbucket").toString
    val pile = (0 until 5000).map(i => (1000L + i, boiler))
    val rows = (pile ++ Seq((1L, nearA), (2L, nearB), (3L, lone)))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("minhash LSH: the 5k-identical pile is capped out, the near-dup tail survives") {
    val pairs = MinHashLsh.nearDupPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    assert(pairs.contains((1L, 2L)), "the genuine near-dup pair must still be found")
    assert(!pairs.exists { case (a, b) => a >= 1000L || b >= 1000L },
      "no candidate pair may come out of the over-cap boilerplate buckets")
  }

  test("ngram Jaccard: capped identically, candidate mass linear") {
    val pairs = DedupQueries.ngramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a >= 1000L || b >= 1000L })
  }

  test("exact dedup still owns the pile: one keeper, 5000 copies reported") {
    val groups = DedupQueries.exact(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap // n_copies -> keeper? see below
    // columns: content_hash, n_copies, keeper_id
    val pile = DedupQueries.exact(spark, dir)
      .filter(col("n_copies") === 5000L).collect()
    assert(pile.length == 1 && pile.head.getLong(2) == 1000L,
      "the byte-identical mass is exact dedup's to collapse — and it does")
    assert(groups.nonEmpty)
  }

  test("under the cap the same corpus shape is NOT cut (cap is the only gate)") {
    // 10 identical docs ≪ cap: every pile pair must appear with jaccard 1.0
    val d = java.nio.file.Files.createTempDirectory("coolbucket").toString
    val rows = ((0 until 10).map(i => (100L + i, boiler)) ++ Seq((1L, nearA), (2L, nearB)))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = MinHashLsh.nearDupPairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    val pilePairs = for (i <- 0 until 10; j <- i + 1 until 10) yield (100L + i, 100L + j)
    assert(pilePairs.forall(pairs.contains),
      "below the cap the pile's pairs are all produced — the cap, not a hidden cut, is the gate")
  }
}
