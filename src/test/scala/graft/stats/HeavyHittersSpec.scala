package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class HeavyHittersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("MG sketch survives eviction pressure: vocab >> m, heavies all kept") {
    // 30 heavy terms × 2000 occurrences + 50k singleton junk terms; m=256
    // forces constant decrement rounds AND merge-side trims. Guarantee:
    // freq 2000 > n/(m+1) = 110000/257 ≈ 428 → every heavy must survive.
    val stream = (0 until 30).flatMap(i => Seq.fill(2000)(s"hh_$i")) ++
      (0 until 50000).map(i => s"junk_$i")
    // deterministic interleave so heavies and junk mix across partitions
    val shuffled = stream.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1048576 }.map(_._1)
    val (got, total) = spark.createDataset(shuffled).repartition(8)
      .select(new HeavyHitters.MisraGries(256).toColumn).head()
    assert(got.length <= 256, s"summary must stay bounded, got ${got.length}")
    assert(total == stream.length.toLong, "the sketch must carry the exact stream length")
    (0 until 30).foreach { i =>
      assert(got.contains(s"hh_$i"), s"heavy hitter hh_$i evicted — guarantee broken")
    }
  }

  test("a flat distribution trips the runtime n/(m+1) guarantee check") {
    // 3000 distinct terms, every count 1: the 20th "hitter" (count 1) sits
    // far below n/(m+1) ≈ 11.7, so exact top-k is NOT provable from the
    // sketch — the query must fail loudly, not return a plausible wrong list
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_flat").toString
    spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j => concat(lit(s"w${j}_"), col("id"))): _*).as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      HeavyHitters.heavyHitters(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("raise Counters")),
      s"expected the guarantee message, got: ${messages(e)}")
  }

  test("a truncated candidate list over unexhausted vocabulary trips the completeness check") {
    // 5 moderately-heavy terms (above n/(m+1)) + a large flat tail: the
    // merge trims kill every singleton, leaving ~5 candidates — all of
    // which clear the per-row bar, so check (a) passes. But a "top-20"
    // with ~5 rows over a corpus holding thousands of unseen terms is
    // silently truncated — check (b) must fail loudly.
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_trunc").toString
    val heavy = (0 until 5).flatMap(i => Seq.fill(300)(s"heavy_$i"))
    val tail = (0 until 3000).map(i => s"tail_$i")
    val words = (heavy ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1048576 }.map(_._1)
    spark.createDataset(words.grouped(25).map(_.mkString(" ")).toSeq)
      .toDF("text").selectExpr("monotonically_increasing_id() AS doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] { HeavyHitters.heavyHitters(spark, dir).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("raise Counters")),
      s"expected the completeness message, got: ${messages(e)}")
  }

  test("sketch-pruned heavy hitters equal the exact vocabulary-wide top-k") {
    val exact = Tables.documents(spark, sf)
      .select(explode(split(col("text"), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(HeavyHitters.TopK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = HeavyHitters.heavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
    assert(got.nonEmpty)
  }

  test("phase 2 is a broadcast-semi prune, not a vocabulary shuffle-and-rank") {
    val p = HeavyHitters.heavyHitters(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), "candidate prune must be a semi join")
    assert(p.contains("BroadcastHashJoin"), "candidates must broadcast")
  }
}
