package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `etl_dq_quarantine` contract: row-level verdicts agree with the
  * report's aggregate counts (the one-source-of-truth rule identity), a
  * planted corpus exercises every rule including the multi-failure
  * concat order, and clean rows never appear. */
class DqQuarantineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("per-rule row counts equal etl_dq_report's events violations") {
    val report = SparkEntry.queries("etl_dq_report")(spark, sf).collect()
      .filter(_.getString(0) == "events")
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val rows = SparkEntry.queries("etl_dq_quarantine")(spark, sf).collect()
      .map(r => r.getString(1).split('|').toSeq)
    val byRule = rows.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    report.foreach { case (rule, violations) =>
      assert(byRule.getOrElse(rule, 0L) == violations,
        s"rule $rule: quarantine rows != report count")
    }
  }

  test("planted corpus: every rule fires, multi-failure list is ordered") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("dqq").toString
    val t0 = new java.sql.Timestamp(1700000000000L)
    Seq(
      (0L, t0, 1L, Some(5.0), "view", "{}"),           // clean
      (1L, t0, 2L, Some(-1.0), "click", ""),           // null_props + neg value
      (2L, t0, -7L, Some(5.0), "view", "{}"),          // bad_user
      (3L, t0, 3L, Some(250.0), "view", "{}"),         // over ceiling
      (4L, t0, 4L, Some(5.0), "view", "{}"),           // dup pair ↓
      (4L, t0, 4L, Some(5.0), "view", "{}"),
      (5L, t0, 5L, None: Option[Double], "view", "{}")) // NULL value — must quarantine
      .toDF("event_id", "ts", "user_id", "value", "event_type", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("etl_dq_quarantine")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(!got.exists(_._1 == 0L), "clean rows never quarantine")
    assert(got.filter(_._1 == 1L).map(_._2) ==
      Seq("null_props|negative_or_null_value"), "fixed rule order in the list")
    assert(got.filter(_._1 == 4L).map(_._2) == Seq("duplicate_event_id", "duplicate_event_id"))
    assert(got.find(_._1 == 2L).get._2 == "bad_user_id")
    assert(got.find(_._1 == 3L).get._2 == "value_above_ceiling")
    assert(got.filter(_._1 == 1L).head._3 == 2L)
    // NULL value is a failure this operator exists to catch — and ONLY
    // that rule fires (the ceiling rule must not NULL-poison n_failed)
    assert(got.find(_._1 == 5L).map(r => (r._2, r._3)) ==
      Some(("negative_or_null_value", 1L)), "NULL value quarantines exactly once")
  }
}
