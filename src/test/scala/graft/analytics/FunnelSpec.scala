package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("funnel stages are strictly ordered in time and stage counts are monotone") {
    val rows = FunnelQueries.funnel(spark, sf).collect()
      .map(r => (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t1, t2, t3, stage) =>
      t2.foreach(c => assert(t1.exists(_.before(c)), "click must follow signup"))
      t3.foreach(p => assert(t2.exists(_.before(p)), "purchase must follow click"))
      val expected = if (t3.isDefined) 3 else if (t2.isDefined) 2 else if (t1.isDefined) 1 else 0
      assert(stage == expected)
    }
    val byStage = (0 to 3).map(k => rows.count(_._4 >= k))
    assert(byStage == byStage.sorted.reverse, s"funnel must narrow: $byStage")
    assert(rows.exists(_._4 == 3) && rows.exists(_._4 < 3),
      "test data must exercise both completers and drop-offs")
  }

  test("funnel and retention shuffle the fact table exactly once (stacked windows, one exchange)") {
    val fp = FunnelQueries.funnel(spark, sf).queryExecution.executedPlan.toString
    assert(fp.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      "three stage windows + the per-user collapse must share one user_id exchange")
    val rp = FunnelQueries.retention(spark, sf).queryExecution.executedPlan.toString
    // one user_id exchange for the cohort window; the distinct-count agg
    // re-keys the tiny (cohort, offset, user) stream afterwards
    assert(rp.linesIterator.indexWhere(_.contains("Exchange hashpartitioning(user_id")) >= 0)
    assert(rp.linesIterator.count(_.contains("Exchange hashpartitioning(user_id")) == 1)
  }

  test("retention row (cohort, 0) covers every user in the cohort") {
    import org.apache.spark.sql.functions._
    val day0 = FunnelQueries.retention(spark, sf)
      .filter(col("day_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val users = graft.Tables.events(spark, sf).select(countDistinct("user_id"))
      .collect()(0).getLong(0)
    assert(day0 == users, "every user is active on their own cohort day")
  }
}
