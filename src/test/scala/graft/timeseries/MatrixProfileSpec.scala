package graft.timeseries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `ts_matrix_profile` — a planted repeated pattern must read mp = 0
  * (motif pair, cross-referenced indices), the planted alien window must
  * carry the discord flag, and the whole profile replays exactly from an
  * independent driver implementation on plant AND corpus. */
class MatrixProfileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  /** Independent profile replica over per-type daily integer series. */
  private def replay(series: Map[String, Seq[Long]])
      : Map[(String, Long), (Option[Double], Option[Long])] = {
    val m = MatrixProfile.M
    series.flatMap { case (tpe, vs) =>
      val subs = (0 to vs.size - m).map(i => i.toLong -> vs.slice(i, i + m))
      subs.map { case (i, a) =>
        val cands = subs.filter { case (j, _) => math.abs(i - j) >= MatrixProfile.Excl }
          .flatMap { case (j, b) =>
            val sa = a.sum; val sb = b.sum
            val saa = a.map(x => x * x).sum; val sbb = b.map(x => x * x).sum
            val sab = a.zip(b).map { case (x, y) => x * y }.sum
            val vna = m * saa - sa * sa; val vnb = m * sbb - sb * sb
            if (vna > 0 && vnb > 0) {
              val r = (m * sab - sa * sb).toDouble / math.sqrt(vna.toDouble * vnb.toDouble)
              val dist = BigDecimal(math.sqrt(math.max(0.0, 2.0 * m * (1.0 - r))))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              Some(j -> dist)
            } else None
          }
        val best = cands.sortBy { case (j, dd) => (dd, j) }.headOption
        (tpe, i) -> (best.map(_._2), best.map(_._1))
      }
    }
  }

  test("planted series: the exact repeat reads mp = 0 as a cross-referenced motif pair; the alien bump is the discord") {
    val pattern = Seq(1L, 5L, 2L, 8L, 3L)
    val bump = Seq(50L, 2L, 90L, 4L, 60L)
    val filler = Seq(4L, 6L, 3L, 7L, 5L)
    val vals = pattern ++ bump ++ pattern ++ filler // days 0-19
    val rows = vals.zipWithIndex.map { case (v, day) =>
      (day.toLong, new java.sql.Timestamp(1704067200000L + day.toLong * 86400000L),
        1L, "mm", v.toDouble, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_mp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("ts_matrix_profile")(spark, dir).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4), r.getBoolean(5))).toMap
    graft.CacheRegistry.releaseAll()
    // the exact repeat: subsequences 0 and 10 are identical -> z-distance 0
    assert(out(0L)._1.contains(0.0) && out(0L)._2.contains(10L), s"i=0: ${out(0L)}")
    assert(out(10L)._1.contains(0.0) && out(10L)._2.contains(0L), s"i=10: ${out(10L)}")
    assert(out(0L)._3 && out(10L)._3, "the repeated pattern is the motif pair")
    // the discord sits on a window overlapping the alien bump (days 5-9)
    val discords = out.filter(_._2._4).keys.toSeq
    assert(discords.nonEmpty && discords.forall(i => i >= 2L && i <= 9L),
      s"discord must overlap the planted bump: $discords")
    // exact replica of every mp value and index
    val rep = replay(Map("mm" -> vals))
    out.foreach { case (i, (mp, idx, _, _)) =>
      assert((mp, idx) == rep(("mm", i)), s"i=$i: ($mp,$idx) != ${rep(("mm", i))}")
    }
  }

  test("corpus: engine profile equals the driver replica exactly for every (type, i)") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) AS day",
        "cast(value as decimal(18,2)) AS v")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions
        .expr("cast(round(cast(sum(v) as double)) as long)").as("vi"))
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val rep = replay(daily)
    val out = graft.SparkEntry.queries("ts_matrix_profile")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out.nonEmpty && out.keySet == rep.keySet)
    out.foreach { case (k, v) => assert(v == rep(k), s"$k: $v != ${rep(k)}") }
  }
}
