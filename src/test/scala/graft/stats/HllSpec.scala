package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `stats_hll_distinct` contract: the registers replay driver-side from
  * first principles (md5 bucket/ρ, integer harmonic sum, α-estimator with
  * linear counting), and the estimate lands inside HLL's error envelope of
  * the exact distinct count. `stats_sketch_eval` contract: rows replay
  * from the composed sketches' own outputs (the drift-proof identity). */
class HllSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(v: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Pure-Scala replica of the whole sketch chain for one group. */
  private def replica(userIds: Seq[Long]): (Long, Long, Long, Double) = {
    val regs = new Array[Long](Hll.M)
    userIds.foreach { u =>
      val h = md5hex(u.toString)
      val bucket = (java.lang.Long.parseLong(h.substring(0, 2), 16) % Hll.M).toInt
      val w = java.lang.Long.parseLong(h.substring(2, 15), 16)
      val rho = if (w == 0L) 53L else 53L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      regs(bucket) = math.max(regs(bucket), rho)
    }
    val occ = regs.count(_ > 0L).toLong
    val s = regs.map(r => 1L << (53 - r)).sum
    val v = Hll.M - occ
    val eRaw = Hll.Alpha * (Hll.M * Hll.M).toDouble * Hll.Scale / s.toDouble
    // HALF_UP to match production (Spark round / BigDecimal in
    // StreamDistinct.estimate) — math.rint is HALF_EVEN and would diverge
    // on an exact .00005 tie (ADVICE r10)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val est =
      if (eRaw <= 2.5 * Hll.M && v > 0)
        r4(Hll.M.toDouble * math.log(Hll.M.toDouble / v))
      else r4(eRaw)
    (occ, v, s, est)
  }

  test("registers and estimate replay from first principles per group") {
    val rows = graft.Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = SparkEntry.queries("stats_hll_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val byType = rows.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, vs) =>
      assert(got(t) == replica(vs.map(_._2)), s"type $t register chain diverged")
    }
  }

  test("estimate is inside the HLL error envelope of the exact count") {
    val exact = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("stats_hll_distinct")(spark, sf).collect().foreach { r =>
      val (t, est) = (r.getString(0), r.getDouble(4))
      val n = exact(t).toDouble
      assert(est > 0.0)
      // 1.04/sqrt(64) = 13% standard error; allow ~3 sigma
      assert(math.abs(est - n) / n <= 0.40, s"type $t: est $est vs exact $n")
    }
  }

  test("sketch_eval replays from the sketches' own outputs and the exact count") {
    val kmv = SparkEntry.queries("stats_kmv_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val hll = SparkEntry.queries("stats_hll_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val exact = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("stats_sketch_eval")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == exact.keySet)
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == exact(t))
      assert(r.getDouble(2) == kmv(t), s"$t kmv est drifted")
      assert(r.getDouble(4) == hll(t), s"$t hll est drifted")
      def err(est: Double): Double =
        math.rint((est - exact(t)) / exact(t) * 10000) / 10000
      assert(r.getDouble(3) == err(kmv(t)))
      assert(r.getDouble(5) == err(hll(t)))
    }
  }
}
