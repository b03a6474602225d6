package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `dedup_containment` is exact w.r.t. its declared metric (containment over
  * df-capped rare shingles), so the spec replays the whole metric driver-side
  * at sf0.001 and demands equality — not a recall argument. */
class ContainmentSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Driver-side ground truth: per-doc rare-shingle sets → directed pairs. */
  private lazy val truth: Map[(Long, Long), (Long, Double)] = {
    graft.functions.HashExprs.register(spark)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), DedupQueries.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) >= DedupQueries.ContainMinShingles)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1).toSet)
    val df = docs.iterator.flatMap(_._2).toSeq.groupBy(identity).map { case (g, o) => g -> o.size }
    val rare = docs.map { case (id, sh) => id -> sh.filter(g => df(g) <= DedupQueries.ContainDfCap) }
      .filter(_._2.nonEmpty)
    (for {
      (aId, aSh) <- rare
      (bId, bSh) <- rare
      if aId != bId
      shared = (aSh & bSh).size.toLong
      c = shared.toDouble / aSh.size
      if shared > 0 && c >= DedupQueries.ContainTau
    } yield (aId, bId) -> (shared, c)).toMap
  }

  private lazy val got: Map[(Long, Long), (Long, Double)] =
    DedupQueries.containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap

  test("containment pairs exactly match the driver-side rare-shingle replay") {
    assert(truth.nonEmpty, "testdata should contain near-subset pairs")
    assert(got.keySet == truth.keySet,
      s"missed ${truth.keySet -- got.keySet}, extra ${got.keySet -- truth.keySet}")
    got.foreach { case (k, (shared, c)) =>
      assert((shared, c) == truth(k), s"pair $k: got ($shared,$c), want ${truth(k)}")
    }
  }

  test("containment is directional: paired docs score differently by direction") {
    // The metric's point vs Jaccard: c(a→b) = |A∩B|/|A| depends on which
    // side is the denominator. The seeded corpus's near-dup pairs differ in
    // rare-shingle count, so both-direction pairs must carry unequal values
    // (a symmetric metric like Jaccard could never produce this).
    val valueAsym = got.collect {
      case ((a, b), (_, c)) if got.get((b, a)).exists(_._2 != c) => (a, b)
    }
    assert(valueAsym.nonEmpty, "expected direction-dependent containment values")
  }

  test("candidate generation is an equi-join on the df-capped inverted index") {
    val p = DedupQueries.containment(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "no all-pairs join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no NLJ")
  }
}
