package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.graft.scale.approx` contract (graft.ScaleMode), per operator:
  * (a) conf-off output is the unchanged exact form (the oracle-checked
  * contract — asserted here as the exact plan shape still being present),
  * (b) the conf-on PHYSICAL plan drops the scale hazard (partition-less
  * window / per-type NTILE / exact percentile buffer), and (c) conf-on
  * output differs from exact only at the selection/quantile boundary. */
class ScaleModeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def withApprox[A](body: => A): A = {
    spark.conf.set(ScaleMode.Key, "true")
    try body finally {
      spark.conf.unset(ScaleMode.Key)
      CacheRegistry.releaseAll()
    }
  }

  /** Partition-less logical Window nodes (the corpus-through-one-task shape). */
  private def globalWindows(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }.size

  private def anyWindows(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case w: Window => w }.size

  // ---------------------------------------------------------------- outliers

  test("emb_outliers: approx drops the global window; flags differ only at the threshold score") {
    val exact = run("emb_outliers")
    assert(globalWindows(exact) > 0, "(a) exact mode must still rank globally")
    val (approxRows, gw) = withApprox {
      val df = run("emb_outliers")
      (df.collect(), globalWindows(df))
    }
    assert(gw == 0, "(b) approx plan must contain no partition-less window")
    val e = exact.collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val a = approxRows.map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(e.keySet == a.keySet, "same vectors scored")
    // boundary: the exact cutoff is the highest flagged score; approx flags
    // score <= sketch-threshold. Any disagreement must sit between the two
    // cutoffs (inclusive) — i.e. exactly the threshold tie region.
    val eCut = e.values.collect { case (s, true) => s }.maxOption.getOrElse(Double.NegativeInfinity)
    val aCut = a.values.collect { case (s, true) => s }.maxOption.getOrElse(Double.NegativeInfinity)
    val (lo, hi) = (math.min(eCut, aCut), math.max(eCut, aCut))
    val disagree = e.keys.filter(k => e(k)._2 != a(k)._2)
    disagree.foreach { k =>
      assert(e(k)._1 >= lo && e(k)._1 <= hi,
        s"vec $k flag flipped with score ${e(k)._1} outside boundary [$lo, $hi]")
    }
  }

  // ---------------------------------------------------- importance resampling

  test("sample_importance: approx drops the global rank; membership and ranks differ only at the weight boundary") {
    val exactDf = run("sample_importance")
    assert(globalWindows(exactDf) > 0, "(a) exact mode must still rank globally")
    val exact = exactDf.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (approx, gw) = withApprox {
      val df = run("sample_importance")
      (df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap,
        globalWindows(df))
    }
    assert(gw == 0, "(b) approx plan must contain no partition-less window")
    assert(exact.nonEmpty && approx.nonEmpty)
    // boundary interval in weight space: between the lowest selected weight
    // of either mode
    val lo = math.min(exact.values.map(_._1).min, approx.values.map(_._1).min)
    val hi = math.max(exact.values.map(_._1).min, approx.values.map(_._1).min)
    (exact.keySet diff approx.keySet).foreach { d =>
      assert(exact(d)._1 >= lo && exact(d)._1 <= hi,
        s"doc $d only in exact with weight ${exact(d)._1} outside boundary [$lo,$hi]")
    }
    (approx.keySet diff exact.keySet).foreach { d =>
      assert(approx(d)._1 >= lo && approx(d)._1 <= hi,
        s"doc $d only in approx with weight ${approx(d)._1} outside boundary [$lo,$hi]")
    }
    // ranks of every doc strictly above the boundary are identical: the set
    // of docs ordered ahead of it is the same in both modes
    (exact.keySet intersect approx.keySet).filter(d => exact(d)._1 > hi).foreach { d =>
      assert(exact(d)._2 == approx(d)._2, s"rank of non-boundary doc $d changed")
    }
  }

  // ------------------------------------------------------------ balanced

  test("sample_balanced: approx pre-filter bounds the per-label window and reproduces the exact pick") {
    val exact = run("sample_balanced").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val approx = withApprox { run("sample_balanced").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))) }
    // the uniform-hash threshold admits a superset of the exact pick on any
    // corpus where the 2x slack holds (all driver corpora); the trimmed
    // output is then byte-identical — the boundary case is the vanishing
    // Chernoff tail where the slack undershoots a label
    assert(approx.toSeq == exact.toSeq)
  }

  // ------------------------------------------------------------ length stats

  test("text_length_stats: approx swaps the exact percentile buffer for the sketch; quantiles stay within the rank boundary") {
    val exact = run("text_length_stats")
    assert(exact.queryExecution.optimizedPlan.toString.contains("percentile("),
      "(a) exact mode must aggregate with the exact percentile")
    val approxRows = withApprox {
      val df = run("text_length_stats")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx") && !plan.contains("percentile(n_words"),
        "(b) approx plan must use the mergeable sketch, not the exact buffer")
      df.collect()
    }
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    // non-quantile columns identical; quantiles within the adjacent order
    // statistics of the lang's n_words distribution
    val words = Tables.documents(spark, sf)
      .selectExpr("lang", "size(split(text, '\\\\s+')) AS nw").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getInt(1).toLong).sorted.toIndexedSeq)
    approxRows.foreach { r =>
      val lang = r.getString(0)
      val x = e(lang)
      for (i <- Seq(1, 2, 3, 4, 7)) assert(r.get(i) == x.get(i), s"non-quantile col $i lang $lang")
      val vs = words(lang)
      def bounds(p: Double): (Double, Double) = {
        val pos = p * (vs.size - 1)
        (vs(math.floor(pos).toInt).toDouble, vs(math.ceil(pos).toInt).toDouble)
      }
      val (l50, h50) = bounds(0.5); val (l90, h90) = bounds(0.9)
      assert(r.getDouble(5) >= l50 && r.getDouble(5) <= h50, s"p50 boundary lang $lang")
      assert(r.getDouble(6) >= l90 && r.getDouble(6) <= h90, s"p90 boundary lang $lang")
    }
  }

  // ------------------------------------------------------------ equidepth

  test("stats_equidepth: approx drops the NTILE window; buckets conserve rows and differ only by tie placement at cuts") {
    val exact = run("stats_equidepth")
    assert(anyWindows(exact) > 0, "(a) exact mode must still NTILE per type")
    val (approxRows, nw) = withApprox {
      val df = run("stats_equidepth")
      (df.collect(), anyWindows(df))
    }
    assert(nw == 0, "(b) approx plan must contain no window at all")
    val e = exact.collect().groupBy(_.getString(0))
    val a = approxRows.groupBy(_.getString(0))
    assert(e.keySet == a.keySet)
    e.keySet.foreach { t =>
      // row conservation per type
      assert(e(t).map(_.getLong(2)).sum == a(t).map(_.getLong(2)).sum, s"rows lost for $t")
      // coverage: same overall value range
      assert(e(t).map(_.getLong(3)).min == a(t).map(_.getLong(3)).min, s"min lo for $t")
      assert(e(t).map(_.getLong(4)).max == a(t).map(_.getLong(4)).max, s"max hi for $t")
      // buckets ordered and non-overlapping (ties at a cut live in ONE
      // bucket here, so ranges may touch but never invert)
      val byB = a(t).sortBy(_.getLong(1))
      byB.foreach(r => assert(r.getLong(3) <= r.getLong(4)))
      byB.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0).getLong(4) <= pair(1).getLong(3), s"overlap in $t")
      }
    }
  }

  // ------------------------------------------------------- rolling quantile

  test("ts_rolling_quantile: approx replaces rank windows with sketches; values stay within the window's adjacent order stats") {
    val exact = run("ts_rolling_quantile")
    assert(anyWindows(exact) > 0, "(a) exact mode must still rank per window")
    val (approxRows, nw) = withApprox {
      val df = run("ts_rolling_quantile")
      (df.collect(), anyWindows(df))
    }
    assert(nw == 0, "(b) approx plan must aggregate, not window")
    // driver-side replay of the trailing windows (tiny at spec SF)
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "datediff(to_date(ts), date '1970-01-01') AS ed", "value")
      .groupBy("event_type", "ed")
      .agg(org.apache.spark.sql.functions.expr("CAST(round(sum(value)) AS LONG)").as("vi"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val eMap = exact.collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay) -> r).toMap
    approxRows.foreach { r =>
      val key = (r.getString(0), r.getDate(1).toLocalDate.toEpochDay)
      val ex = eMap(key)
      assert(r.getLong(2) == ex.getLong(2), s"n_days differs at $key")
      val win = byType(r.getString(0))
        .filter(d => d._2 <= key._2 && d._2 > key._2 - RollingQuantileWin)
        .map(_._3).sorted
      val n = win.size
      // p50: within the two middle order stats; p90: within one rank of
      // the nearest-rank p90
      val (m1, m2) = (win((n + 1) / 2 - 1), win((n + 2) / 2 - 1))
      assert(r.getDouble(3) >= m1 && r.getDouble(3) <= m2, s"p50 boundary at $key")
      val k90 = (9 * n + 9) / 10
      val cands = Seq(k90 - 1, k90, k90 + 1)
        .filter(k => k >= 1 && k <= n).map(k => win(k - 1))
      assert(cands.contains(r.getLong(4)), s"p90 ${r.getLong(4)} not adjacent to nearest-rank at $key")
    }
  }

  private val RollingQuantileWin = graft.timeseries.RollingQuantile.WindowDays

  // ---------------------------------------------------------- recall audit

  test("dedup_recall_eval: approx compiles the genuine block sample; exact form untouched") {
    val exact = run("dedup_recall_eval").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    CacheRegistry.releaseAll()
    val (approxRows, planStr) = withApprox {
      val df = run("dedup_recall_eval")
      (df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap,
        df.queryExecution.optimizedPlan.toString)
    }
    // (b) conf-on plan carries the <25 block-sample predicate on the
    // md5 block key — a genuine sample, not the vacuous <100 form
    assert(planStr.contains(s"< ${graft.dedup.DedupQueries.EvalSamplePctApprox}"),
      "approx plan must filter blocks at the sampled rate")
    assert(!planStr.contains("< 100"), "the full-truth predicate must be gone")
    // (c) sampled truth is a per-block subset of the full truth: every
    // sampled lang's counts are bounded by the exact run's
    approxRows.foreach { case (lang, (nTrue, nHit)) =>
      val (eTrue, eHit) = exact(lang)
      assert(nTrue <= eTrue && nHit <= eHit, s"$lang sample exceeds full truth")
      assert(nHit <= nTrue)
    }
    // (a) conf-off output identity after the conf round-trip (the staged
    // index is shared between modes; the sample must be a per-consumer
    // filter, never baked into the staged artifact)
    val again = run("dedup_recall_eval").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    CacheRegistry.releaseAll()
    assert(again == exact, "conf-off output unchanged after an approx run")
  }
}
