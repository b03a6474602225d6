package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.RewriteContainmentJoin

/** VERDICT r6 #3: the UNCHANGED `EtlQueries.zoneMulti` entry point must
  * route itself past the broadcast NLJ when the zone dim outgrows
  * `spark.sql.autoBroadcastJoinThreshold` — the 40k-intersections /
  * census-block regime — via the size-gated RewriteContainmentJoin rule,
  * and must keep the broadcast NLJ for the real 5-row dim. */
class ZoneMultiAutoRouteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** A corpus dir whose region table is a synthetic 100k-zone dim (the
    * operator derives zone geometry from r_regionkey, so only the two
    * columns it reads are needed) over a small event subset. Keys 0..4
    * are the live zones the assignments come from; the other ~100k keys
    * are negative, which the geometry formula (rx = 0.03 + r·0.004)
    * turns into degenerate boxes — they keep the dim's SIZE real (what
    * the routing keys on) while matching nothing, so the fixture stays
    * bounded under both the NLJ and the cell plan. */
  private lazy val bigZoneDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zones100k").toString
    spark.read.parquet(s"$sf/events.parquet").limit(120)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    spark.range(-100000, 5)
      .selectExpr("id AS r_regionkey", "concat('zone_', id) AS r_name")
      .write.mode("overwrite").parquet(s"$tmp/region.parquet")
    tmp
  }

  test("a 100k-zone dim flips every zone join to the cell equi-join (no BNLJ), output unchanged") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 100 * 1024)
    try {
      val df = EtlQueries.zoneMulti(spark, bigZoneDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "oversized zone dim must not plan a broadcast NLJ")
      assert(plan.contains("_gcell"),
        "the grid-cell equi-join must carry the rewrite's cell keys")
      val auto = df.collect().map(_.toSeq)
      // reference: routing off → the operator's own broadcast-hinted NLJ
      spark.conf.set(RewriteContainmentJoin.AutoKey, "false")
      val refDf = EtlQueries.zoneMulti(spark, bigZoneDir)
      assert(refDf.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      val ref = refDf.collect().map(_.toSeq)
      assert(auto.toSeq == ref.toSeq, "cell routing must not change a single assignment")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(RewriteContainmentJoin.AutoKey)
    }
  }

  test("the real 5-row zone dim keeps its broadcast NLJ (no rewrite below the threshold)") {
    val plan = EtlQueries.zoneMulti(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "small dims must keep the optimal broadcast NLJ")
    assert(!plan.contains("_gcell"), "no cell rewrite below the broadcast threshold")
  }
}
