package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SurvivorshipSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val versions: Map[Long, Seq[(Long, String, Double, String, Long)]] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("props"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(1), (r.getLong(0), r.getString(2), r.getDouble(3),
        r.getString(4), r.getLong(5))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  private def key(v: (Long, String, Double, String, Long)): Long =
    (v._5 - Survivorship.OrderEpochMicros) * Survivorship.OrderIdSlots +
      v._1 % Survivorship.OrderIdSlots

  test("golden records equal a driver-side replay of the survivorship rules") {
    val got = Survivorship.goldenRecords(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(4),
        Option(r.get(5)).map(_.asInstanceOf[Double]), Option(r.getString(6))))).toMap
    assert(got.keySet == versions.keySet)
    versions.foreach { case (uid, vs) =>
      val (n, latestType, latestVal, latestProps) = got(uid)
      assert(n == vs.size.toLong)
      assert(latestType == vs.maxBy(key)._2)
      val posVs = vs.filter(_._3 >= 200.0)
      val expectVal = if (posVs.isEmpty) None
        else Some(BigDecimal(posVs.maxBy(key)._3)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(latestVal == expectVal, s"user $uid")
      val okProps = vs.filter(v => v._4 != null && v._4.nonEmpty && v._4 != """{"k": 0}""")
      val expectProps = if (okProps.isEmpty) None else Some(okProps.maxBy(key)._4)
      assert(latestProps == expectProps, s"user $uid")
    }
  }

  test("field-level survivorship actually diverges from row-level latest") {
    // at least one golden record must take a field from an OLDER version
    // than its latest row (else the per-field gating is untested)
    val diverges = versions.exists { case (_, vs) =>
      val latest = vs.maxBy(key)
      (latest._3 < 200.0 && vs.exists(_._3 >= 200.0)) ||
        (latest._4 == """{"k": 0}""" && vs.exists(v => v._4 != null && v._4.nonEmpty && v._4 != """{"k": 0}"""))
    }
    assert(diverges, "corpus never exercises the validity gate; strengthen the rule")
  }

  test("time travel reconstructs the exact per-entity state at T") {
    val t = java.sql.Timestamp.valueOf(Survivorship.AsOfTs)
    val versions = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts").collect()
      .filter(!_.getTimestamp(4).after(t))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getTimestamp(4)))
    val got = Survivorship.timeTravel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getTimestamp(2), r.getLong(3),
        r.getString(4), r.getDouble(5))).toMap
    val byUser = versions.groupBy(_._1)
    assert(got.keySet == byUser.keySet, "snapshot must hold exactly the entities born by T")
    byUser.foreach { case (u, vs) =>
      val (n, vts, vid, tpe, v) = got(u)
      assert(n == vs.size.toLong)
      // winner: max (micros, event_id) — the packed-key total order
      def micros(ts: java.sql.Timestamp) = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
      val win = vs.maxBy(x => (micros(x._5), x._2))
      assert(vts == vs.map(_._5).max && vid == win._2 && tpe == win._3, s"user $u winner")
      assert(v == BigDecimal(win._4).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("the time-travel cutoff pushes into the parquet scan") {
    val p = Survivorship.timeTravel(spark, sf).queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("LessThan"), s"no pushed ts bound in: $scanLine")
  }
}
