package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-Min sketch contract (`stats_cms`): one-sided error (estimates
  * never undercount), the e·n/w error bound, partitioning invariance, and
  * probe coverage. */
class CmsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val est: Map[Long, Long] =
    CountMin.cmsFreq(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val exact: Map[Long, Long] = {
    import org.apache.spark.sql.functions._
    graft.Tables.events(spark, sf)
      .filter(col("user_id") < CountMin.NProbes)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("every probe gets exactly one estimate row") {
    assert(est.keySet == (0L until CountMin.NProbes).toSet)
  }

  test("estimates never undercount (one-sided error)") {
    (0L until CountMin.NProbes).foreach { u =>
      val ex = exact.getOrElse(u, 0L)
      assert(est(u) >= ex, s"user $u: est ${est(u)} < exact $ex")
    }
  }

  test("estimates stay within the e*n/w CMS bound") {
    val n = graft.Tables.events(spark, sf).count()
    val bound = math.ceil(math.E * n / CountMin.W).toLong
    (0L until CountMin.NProbes).foreach { u =>
      val err = est(u) - exact.getOrElse(u, 0L)
      assert(err <= bound, s"user $u: error $err exceeds e*n/w = $bound")
    }
  }

  test("the sketch build is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    // same aggregate over a deliberately skewed repartition must agree:
    // integer counts + min are order-independent
    val shuffled = graft.Tables.events(spark, sf).repartition(7, col("event_type"))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_cms").toString
    shuffled.write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val est2 = CountMin.cmsFreq(spark, dir2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est2 == est)
  }

  test("a collision-heavy sketch still bounds the min over rows") {
    // absent probes estimate as pure collision mass: >= 0 and bounded
    val absent = (0L until CountMin.NProbes).filterNot(exact.contains)
    absent.foreach(u => assert(est(u) >= 0L))
  }

  test("stats_cms_eval: one-sidedness holds on every row and both columns replay") {
    val got = graft.SparkEntry.queries("stats_cms_eval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (0L until CountMin.NProbes), "one row per probe")
    got.foreach { case (u, nTrue, estC, over) =>
      assert(nTrue == exact.getOrElse(u, 0L), s"probe $u exact count drifted")
      assert(estC == est(u), s"probe $u estimate drifted from stats_cms")
      assert(over == estC - nTrue)
      // THE Count-Min theorem as an executable invariant: the min of
      // counters that each include the probe's own mass can never undercount
      assert(over >= 0L, s"probe $u undercounted — one-sidedness violated")
    }
  }
}
