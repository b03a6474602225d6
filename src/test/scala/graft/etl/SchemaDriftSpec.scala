package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `etl_schema_drift`: driver-side replay on the synthetic corpus plus a
  * planted payload evolution exercising all four verdicts. */
class SchemaDriftSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("verdicts equal a driver-side replay on the corpus") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("unix_date(to_date(ts)) AS ed", "props").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1)))
    val mid = (rows.map(_._1).min + rows.map(_._1).max) / 2
    val halves = rows.map { case (ed, p) => (if (ed <= mid) 1 else 2, p) }
    val n1t = halves.count(_._1 == 1).toLong
    val n2t = halves.count(_._1 == 2).toLong
    val keys = halves.flatMap { case (h, p) =>
      "\"([^\"]+)\"\\s*:".r.findAllMatchIn(p).map(m => (h, m.group(1)))
    }
    val got = SchemaDrift.drift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(5))).toMap
    val expected = keys.groupBy(_._2).map { case (k, ks) =>
      val n1 = ks.count(_._1 == 1).toLong
      val n2 = ks.count(_._1 == 2).toLong
      val shifted = SchemaDrift.ShiftDen * math.abs(n1 * n2t - n2 * n1t) >
        SchemaDrift.ShiftNum * n1t * n2t
      k -> (n1, n2,
        if (n1 == 0) "new" else if (n2 == 0) "dropped"
        else if (shifted) "rate_shift" else "stable")
    }
    assert(got == expected)
    // the synthetic corpus payload is stable by construction
    assert(got.values.forall(_._3 == "stable"), s"unexpected drift: $got")
  }

  test("introduced, removed, and throttled keys get the right verdicts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // days 0..99 (mid=49): 'always' everywhere; 'legacy' only first half;
    // 'added' only second half; 'throttled' 100% -> 10% of payloads
    spark.sql(
      """SELECT id AS event_id, (1704110400 + id * 86400) * 1000000000 AS ts,
        | id % 7 AS user_id, 'x' AS event_type, 1.0 AS value,
        | concat('{"always": 1',
        |   CASE WHEN id < 50 THEN ', "legacy": 2' ELSE '' END,
        |   CASE WHEN id >= 50 THEN ', "added": 3' ELSE '' END,
        |   CASE WHEN id < 50 OR id % 10 = 0 THEN ', "throttled": 4' ELSE '' END,
        |   '}') AS props
        |FROM range(100)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SchemaDrift.drift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    assert(got == Map("always" -> "stable", "legacy" -> "dropped",
      "added" -> "new", "throttled" -> "rate_shift"), s"got $got")
  }
}
