package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `emb_bitext_mine` — the margin's reason to exist, pinned: a planted
  * hub vector out-COSINES every true translation pair, yet every true
  * pair out-MARGINS the hub (Artetxe & Schwenk 2019 §3.2); plus an exact
  * first-principles driver replay of the full LSH-candidate margin chain
  * on the corpus. */
class BitextMineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  /** Driver-side margin replica over a (src, tgt, cos4) candidate list —
    * integer ten-thousandth sums, the same exact arithmetic re-derived
    * independently. Returns per-src (best tgt, margin, mutual). */
  private def replay(cand: Seq[(Long, Long, Double)]): Map[Long, (Long, Double, Boolean)] = {
    val c = cand.map { case (s, t, c4) => (s, t, math.round(c4 * 10000)) }
    def topkSum(rows: Seq[(Long, Long)]): (Long, Long) = { // (sum, k) over top K
      val top = rows.sortBy { case (id, ci) => (-ci, id) }.take(BitextMine.K)
      (top.map(_._2).sum, top.size.toLong)
    }
    val srcStats = c.groupBy(_._1).map { case (s, rows) =>
      s -> topkSum(rows.map(r => (r._2, r._3))) }
    val tgtStats = c.groupBy(_._2).map { case (t, rows) =>
      t -> topkSum(rows.map(r => (r._1, r._3))) }
    val margins = c.map { case (s, t, ci) =>
      val (ss, ks) = srcStats(s); val (st, kt) = tgtStats(t)
      val m = BigDecimal(2.0 * ci * ks * kt / (ss * kt + st * ks).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (s, t, m)
    }
    val bestPerTgt = margins.groupBy(_._2).map { case (t, rows) =>
      t -> rows.minBy { case (s, _, m) => (-m, s) }._1 }
    margins.groupBy(_._1).map { case (s, rows) =>
      val (_, t, m) = rows.minBy { case (_, t, m) => (-m, t) }
      s -> (t, m, bestPerTgt(t) == s)
    }
  }

  test("planted hub: raw cosine retrieves the hub for EVERY source; margin retrieves the true pair for every source") {
    // 4 true translation pairs at cos 0.70; hub target 99 at cos 0.75 to
    // every source (the hub WINS raw cosine everywhere); background 0.20
    val srcs = (1L to 4L)
    val cand = srcs.flatMap { s =>
      val truePair = (s, s + 10L, 0.70)
      val hub = (s, 99L, 0.75)
      val noise = srcs.filter(_ != s).map(o => (s, o + 10L, 0.20))
      truePair +: hub +: noise
    }
    // raw-cosine argmax: the hub failure — 0/4 true pairs recalled
    val rawBest = cand.groupBy(_._1).map { case (s, rows) =>
      s -> rows.minBy { case (_, t, c) => (-c, t) }._2 }
    assert(rawBest.values.forall(_ == 99L), s"raw cosine must pick the hub everywhere: $rawBest")
    // margin argmax: 4/4 true pairs, hub demoted — and the engine agrees
    // with the independent driver replica exactly
    val out = BitextMine.mineFromCandidates(
        cand.toDF("src_id", "tgt_id", "cos4"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getBoolean(4), r.getBoolean(5))).toMap
    val rep = replay(cand)
    srcs.foreach { s =>
      val (t, m, acc, mut) = out(s)
      assert(t == s + 10L, s"margin must retrieve the true pair for $s, got $t")
      assert(m == rep(s)._2, s"engine margin $m != replica ${rep(s)._2}")
      assert(acc, s"true pair margin $m must clear MarginTau=${BitextMine.MarginTau}")
      assert(mut == rep(s)._3)
      assert(mut, s"true pairs are mutual best: $s")
    }
    // the hub's margin for any source is strictly below the true pair's
    // (its own rich neighborhood discounts it) — recompute directly
    val ci070 = 7000L; val ci075 = 7500L; val ci020 = 2000L
    val sSrc = ci075 + ci070 + ci020 + ci020 // every source's top-4 sum
    val sHub = 4 * ci075                     // the hub's top-4 sum
    val sTrue = ci070 + 3 * ci020            // each true target's top-4 sum
    val mHub = 2.0 * ci075 * 4 * 4 / (sSrc * 4 + sHub * 4).toDouble
    val mTrue = 2.0 * ci070 * 4 * 4 / (sSrc * 4 + sTrue * 4).toDouble
    assert(mTrue > mHub, s"margin math: true $mTrue must beat hub $mHub")
  }

  test("corpus: engine output equals the first-principles driver replay of the LSH-candidate margin chain") {
    val cand = BitextMine.lshCandidates(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(cand.nonEmpty, "cross-language banded candidates must exist on the corpus")
    val rep = replay(cand)
    val out = graft.SparkEntry.queries("emb_bitext_mine")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))
    assert(out.length == rep.size, "one row per source with candidates")
    out.foreach { case (s, (t, m, acc, mut)) =>
      val (rt, rm, rmut) = rep(s)
      assert(t == rt, s"src $s: best tgt $t != $rt")
      assert(m == rm, s"src $s: margin $m != $rm")
      assert(acc == (m >= BitextMine.MarginTau))
      assert(mut == rmut, s"src $s: mutual flag")
    }
  }
}
