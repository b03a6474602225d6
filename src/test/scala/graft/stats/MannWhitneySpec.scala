package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `stats_mannwhitney` — textbook anchors (complete separation, identical
  * distributions, the hand-computed tie case) plus an exact driver
  * replica of U and z on the corpus. */
class MannWhitneySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    new java.sql.Timestamp(1704067200000L + day.toLong * 86400000L)

  private def writeEvents(dir: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def run(dir: String): Map[(String, String), (Long, Long, Double, Option[Double], Boolean)] = {
    val out = graft.SparkEntry.queries("stats_mannwhitney")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getBoolean(6))).toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  /** Independent replica: U_a = #(a>b) + 0.5·#(a=b) pair-counted
    * directly (the DEFINITION, not the rank-sum identity), z from the
    * tie-corrected normal approximation. */
  private def replay(a: Seq[Long], b: Seq[Long]): (Double, Option[Double]) = {
    val u = a.map(x => b.count(x > _) + 0.5 * b.count(x == _)).sum
    val n = a.size + b.size
    val tsum = (a ++ b).groupBy(identity).values
      .map(g => g.size.toLong).map(t => t * t * t - t).sum
    val s2 = a.size.toDouble * b.size / 12.0 *
      ((n + 1).toDouble - tsum.toDouble / (n.toLong * (n - 1)).toDouble)
    val z = if (a.nonEmpty && b.nonEmpty && n > 1 && s2 > 0)
      Some(BigDecimal((u - a.size.toDouble * b.size / 2.0) / math.sqrt(s2))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    else None
    (u, z)
  }

  test("complete separation: U_a = 0, strongly negative z, significant; identical distributions: z = 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mw").toString
    // lo: 10 days of small values; hi: same days, values 100x; id1/id2
    // identical non-constant distributions
    val rows = (0 until 10).flatMap { d =>
      Seq((d * 4L, ts(d), 1L, "lo", 1.0 + d % 3), (d * 4 + 1L, ts(d), 1L, "hi", 500.0 + d),
        (d * 4 + 2L, ts(d), 1L, "id1", 10.0 + d % 2), (d * 4 + 3L, ts(d), 1L, "id2", 10.0 + d % 2))
    }
    writeEvents(dir, rows)
    val out = run(dir)
    val sep = out(("hi", "lo")) // 'hi' < 'lo' lexicographically
    assert(sep._3 == 100.0 && sep._4.exists(_ > 3.0) && sep._5,
      s"complete separation: hi wins every pair -> U_a = na*nb, big z: $sep")
    val same = out(("id1", "id2"))
    assert(same._3 == 50.0 && same._4.contains(0.0) && !same._5,
      s"identical distributions: U = na*nb/2, z = 0: $same")
  }

  test("hand-computed tie case: A={1,1} B={1,2} gives U_a = 1.0 (doubled-rank arithmetic exact)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mw_tie").toString
    val rows = Seq(
      (0L, ts(0), 1L, "aa", 1.0), (1L, ts(1), 1L, "aa", 1.0),
      (2L, ts(0), 1L, "bb", 1.0), (3L, ts(1), 1L, "bb", 2.0))
    writeEvents(dir, rows)
    val out = run(dir)
    val r = out(("aa", "bb"))
    assert(r._1 == 2L && r._2 == 2L && r._3 == 1.0,
      s"U_a = #(a>b) + 0.5#(a=b) = 0 + 0.5*2 = 1.0: $r")
    val (u, z) = replay(Seq(1L, 1L), Seq(1L, 2L))
    assert(r._3 == u && r._4 == z)
  }

  test("family consistency: stats_ttest and stats_mannwhitney read the SAME samples (na/nb agree pair for pair)") {
    // the two tests share one sample definition (per-(type, day)
    // integerized daily sums) BY CONTRACT — two independent preps of the
    // same frame now cross-check each other, so a drift in either op's
    // data prep surfaces as disagreement (the kcore==coreness>=3 pin
    // discipline applied to the stats family)
    val t = graft.SparkEntry.queries("stats_ttest")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    graft.CacheRegistry.releaseAll()
    val u = graft.SparkEntry.queries("stats_mannwhitney")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    graft.CacheRegistry.releaseAll()
    assert(t.keySet == u.keySet, "same type pairs")
    t.foreach { case (k, (na, nb)) =>
      assert(u(k) == ((na, nb)), s"$k: sample sizes diverged — t=$na/$nb u=${u(k)}")
    }
  }

  test("corpus: engine equals the pair-counting definition replica exactly, for every type pair") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(to_date(ts) as string) AS day", "value")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.expr("cast(round(sum(value)) as long)").as("vi"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val out = run(sf)
    assert(out.nonEmpty)
    out.foreach { case ((ta, tb), (na, nb, ua, z, sig)) =>
      val (ru, rz) = replay(daily(ta), daily(tb))
      assert(na == daily(ta).size.toLong && nb == daily(tb).size.toLong)
      assert(ua == ru, s"($ta,$tb): U $ua != $ru")
      assert(z == rz, s"($ta,$tb): z $z != $rz")
      assert(sig == z.exists(v => math.abs(v) >= MannWhitney.ZFlag))
    }
  }
}
