package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EmbeddingLshSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("LSH embedding near-dup: verified pairs, usable recall vs the exact blocked join") {
    val exact = DedupQueries.embeddingCosine(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.embeddingLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every emitted pair really is a near-dup (exact verify ran)
    assert(lsh.forall(_._3 >= 0.35))
    val lshPairs = lsh.map(p => (p._1, p._2)).toSet
    // recall vs the blocked-exact ground truth (LSH is unblocked, so it may
    // legitimately also find cross-label pairs not in `exact`)
    val recall = if (exact.isEmpty) 1.0
      else (exact & lshPairs).size.toDouble / exact.size
    assert(recall >= 0.30, s"recall=$recall over ${exact.size} exact pairs")
    assert(lshPairs.nonEmpty)
  }

  test("LSH embedding near-dup plans as a band equi-join, no nested loop, no block self-join") {
    val p = DedupQueries.embeddingLsh(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), s"must be an equi-join on band keys:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
