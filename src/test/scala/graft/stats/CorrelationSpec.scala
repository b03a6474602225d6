package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class CorrelationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val daily: Map[(String, Long), Long] =
    Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum("value").as("raw"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
        BigDecimal(r.getDouble(2)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .toMap

  private lazy val got: Map[(String, String), (Long, Double, Double)] =
    Correlation.corrMatrix(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

  test("pair moments equal a driver-side replay of the integer-sum formula") {
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val expect = (for {
      i <- types.indices; j <- (i + 1) until types.length
      ta = types(i); tb = types(j)
      days = daily.keys.collect { case (t, d) if t == ta && daily.contains((tb, d)) => d }.toSeq
      if days.size >= 2
    } yield {
      val as = days.map(d => daily((ta, d)))
      val bs = days.map(d => daily((tb, d)))
      val n = days.size.toLong
      val (sa, sb) = (as.sum, bs.sum)
      val sab = as.zip(bs).map { case (x, y) => x * y }.sum
      val (saa, sbb) = (as.map(x => x * x).sum, bs.map(x => x * x).sum)
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val cov = r4((n * sab - sa * sb).toDouble / n / (n - 1))
      val pearson = r4((n * sab - sa * sb).toDouble /
        math.sqrt((n * saa - sa * sa).toDouble) / math.sqrt((n * sbb - sb * sb).toDouble))
      (ta, tb) -> (n, cov, pearson)
    }).toMap
    assert(got == expect)
  }

  test("correlations are bounded and the matrix covers every co-observed pair") {
    assert(got.nonEmpty)
    got.foreach { case ((ta, tb), (n, _, p)) =>
      assert(ta < tb)
      assert(n >= 2)
      assert(p >= -1.0001 && p <= 1.0001, s"|pearson| > 1 for ($ta, $tb): $p")
    }
  }
}
