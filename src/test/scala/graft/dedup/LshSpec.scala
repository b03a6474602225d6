package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Recall/precision properties of the probabilistic dedup operators against
  * exhaustive ground truth (affordable at sf0.001). */
class LshSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Exhaustive (unblocked) shingle-Jaccard pairs above a threshold. */
  private def exhaustivePairs(minJ: Double): Set[(Long, Long)] = {
    graft.functions.HashExprs.register(spark)
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), DedupQueries.shingles(col("text")).as("sh"))
    val a = d.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = d.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("j", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
        size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("j") >= minJ)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash LSH finds every pair with jaccard >= 0.5 (high-recall regime)") {
    val truth = exhaustivePairs(0.5)
    assert(truth.nonEmpty, "testdata should contain strong near-dups")
    val got = MinHashLsh.nearDupPairs(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- got
    assert(missed.isEmpty, s"LSH missed strong pairs: $missed")
  }

  test("minhash LSH output is verified: every emitted pair has jaccard >= 0.10") {
    val bad = MinHashLsh.nearDupPairs(spark, sf).filter(col("jaccard") < 0.10).count()
    assert(bad == 0)
  }

  test("ngram_jaccard banded candidates have recall 1.0 vs the exact blocked oracle") {
    // The DuckDB oracle for dedup_ngram_jaccard is the exact blocked
    // all-pairs join while the plan generates candidates by b=64/r=1
    // MinHash banding. This pin proves that on the driver's (seed-stable)
    // corpus no true pair misses all 64 signature components — i.e. the
    // oracle hash-compare is deterministic-green, not luck (ADVICE r2).
    graft.functions.HashExprs.register(spark)
    val d = Tables.documents(spark, sf).select(
      col("doc_id"), col("lang"), (col("n_chars") / lit(100)).cast("long").as("lb"),
      DedupQueries.shingles(col("text")).as("sh"))
    val a = d.select(col("doc_id").as("a_id"), col("lang"), col("lb"), col("sh").as("a_sh"))
    val b = d.select(col("doc_id").as("b_id"), col("lang"), col("lb"), col("sh").as("b_sh"))
    val exactBlocked = a.join(b, Seq("lang", "lb")).filter(col("a_id") < col("b_id"))
      .withColumn("j", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
        size(array_union(col("a_sh"), col("b_sh"))))
      .filter(round(col("j"), 4) >= 0.10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupQueries.ngramJaccard(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactBlocked.nonEmpty)
    assert(got == exactBlocked,
      s"banded candidates must reproduce the exact blocked pairs: missed ${exactBlocked -- got}, extra ${got -- exactBlocked}")
  }

  test("verify joins fetch only candidate docs' shingles (broadcast-semi prune)") {
    val p = MinHashLsh.nearDupPairs(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), "shingle table must be semi-join pruned to candidate ids")
    val p2 = DedupQueries.ngramJaccard(spark, sf).queryExecution.executedPlan.toString
    assert(p2.contains("LeftSemi"))
  }

  test("simhash pairs are hamming <= 3 and include identical-content docs") {
    val pairs = SimHash.nearDupPairs(spark, sf)
    assert(pairs.filter(col("hamming") > 3).count() == 0)
    // simhash of near-identical token multisets must collide on all bands
    assert(pairs.count() > 0)
  }
}
