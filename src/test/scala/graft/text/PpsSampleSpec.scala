package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `sample_pps_systematic` contracts: the exact-count identity
  * (sum(copies) = W div step), the certainty stratum (w ≥ step always
  * selected, multiplicity within ±1 of w/step), a full driver replay of
  * the integer weight line, and the two-level-prefix plan shape. */
class PpsSampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val docs: Seq[(Long, Long)] = graft.Tables.documents(spark, TestSpark.sf)
    .selectExpr("doc_id", "greatest(n_chars, 0) AS w").collect()
    .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  private lazy val got: Seq[(Long, Long, Long)] = {
    val rows = SparkEntry.queries("sample_pps_systematic")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    graft.CacheRegistry.releaseAll()
    rows
  }

  test("corpus run equals a driver replay of the integer weight line") {
    val totW = docs.map(_._2).sum
    val step = math.max(totW / PpsSample.TargetN, 1L)
    var cum = 0L
    val expect = docs.flatMap { case (id, w) =>
      val before = cum; cum += w
      val copies = cum / step - before / step
      if (copies >= 1) Some((id, w, copies)) else None
    }
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("exact-count identity and certainty stratum") {
    val totW = docs.map(_._2).sum
    val step = math.max(totW / PpsSample.TargetN, 1L)
    assert(got.map(_._3).sum == totW / step,
      "systematic PPS must hit the target count exactly")
    val byId = got.map(g => g._1 -> g._3).toMap
    docs.foreach { case (id, w) =>
      if (w >= step)
        assert(byId.contains(id), s"doc $id with w=$w >= step=$step must be selected")
      val copies = byId.getOrElse(id, 0L)
      assert(math.abs(copies - w / step) <= 1,
        s"doc $id multiplicity $copies must be within 1 of w/step=${w / step}")
    }
  }

  test("plan: no global-sort window over documents — bucket offsets only") {
    val df = SparkEntry.queries("sample_pps_systematic")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    graft.CacheRegistry.releaseAll()
    // the only empty-partition (global) window runs over the |buckets|
    // frame (grouped rows), never over the raw documents: every Window
    // line with no PARTITION BY must sit above a HashAggregate, which the
    // plan prints as the window reading the aggregated bucket totals
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size == 2, s"exactly the offset + cumsum windows: $windows")
    // partitioned window text lists the partition columns after the spec:
    // `..., [bkt#N], [doc_id#M ASC ...]` — the global offset window has
    // only the order list `[bkt#N ASC ...]`
    assert(windows.count(_.matches(""".*\], \[bkt#\d+L\], \[doc_id#\d+L ASC.*""")) == 1,
      s"the per-doc cumsum must partition by bucket: $windows")
    assert(windows.count(_.contains("sum(bw#")) == 1,
      s"the global window may only run over the bucket totals: $windows")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "bucket offsets and the step scalar must broadcast")
  }
}
