package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class Scd2PivotSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("scd2 intervals partition each user's timeline: no overlap, one current row") {
    val rows = EtlQueries.scd2History(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(3),
        Option(r.getTimestamp(4)), r.getBoolean(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, ivs) =>
      val sorted = ivs.sortBy(_._2)
      // exactly one open (current) interval per user, and it is the last one
      assert(sorted.count(_._5) == 1, s"user $user must have exactly one current row")
      assert(sorted.last._5, s"user $user: the open interval must be the latest")
      // each interval closes exactly where the next opens (contiguous, no overlap)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $user: interval ${a._2} must close at ${b._3}")
        case _ =>
      }
    }
    // compression: adjacent intervals never share the same attribute value
    val byUser = EtlQueries.scd2History(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).groupBy(_._1)
    byUser.values.foreach { ivs =>
      ivs.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a != b, "consecutive intervals must differ in value")
        case _ =>
      }
    }
  }

  test("scd2 n_events roll back up to the fact count") {
    val total = EtlQueries.scd2History(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("pivot day columns sum to the per-type event count") {
    import org.apache.spark.sql.functions._
    val p = EtlQueries.pivotDow(spark, sf)
      .withColumn("row_total", (0 to 6).map(d => col(s"d$d")).reduce(_ + _))
      .select(col("event_type"), col("row_total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == expected)
  }

  test("pivot plan has no distinct-values discovery job (explicit value list)") {
    val p = EtlQueries.pivotDow(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CollectLimit"), "explicit pivot values must avoid a discovery query")
  }

  test("cube lattice is self-consistent: ALL/ALL equals the grand total") {
    val rows = graft.relational.CoreQueries.q10Cube(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val grand = rows(("ALL", "ALL"))
    val statuses = rows.keys.map(_._1).filter(_ != "ALL").toSeq
    assert(statuses.map(st => rows((st, "ALL"))).sum == grand)
    val prios = rows.keys.map(_._2).filter(_ != "ALL").toSeq
    assert(prios.map(pr => rows(("ALL", pr))).sum == grand)
  }
}
