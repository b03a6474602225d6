package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class KmvSketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def rows = KmvSketch.kmvDistinct(spark, sf).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("estimate stays within the random-hash error bound of the true distinct count") {
    val truth = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = rows
    assert(got.nonEmpty)
    got.foreach { case (tpe, kUsed, _, est) =>
      val n = truth(tpe)
      if (kUsed < KmvSketch.K) assert(est == n.toDouble, s"$tpe: below-K must be exact")
      else {
        // random-hash KMV: relative error ~ 1/sqrt(K-2); allow 3 sigma.
        // the LCG-over-sequential-ids hash is low-discrepancy, so the
        // observed error is far smaller — this is the WEAK bound.
        val tol = 3.0 / math.sqrt(KmvSketch.K - 2.0)
        assert(math.abs(est - n) / n <= tol, s"$tpe: est $est vs true $n")
      }
    }
  }

  test("the sketch is invariant to partitioning (merge order cannot matter)") {
    import spark.implicits._
    val hashed = Tables.events(spark, sf)
      .select(col("event_type"),
        ((col("user_id") * KmvSketch.HashA + KmvSketch.HashB) % KmvSketch.HashP).as("hv"))
    def run(parts: Int) = hashed.repartition(parts)
      .as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(new KmvSketch.KmvAgg(KmvSketch.K).toColumn.name("kmv"))
      .collect().toMap
    assert(run(3) == run(17))
  }

  test("below-K sketch is exactly the distinct hash set size; ties and dups collapse") {
    import spark.implicits._
    // 10 distinct values, each duplicated 5x, K=64 → exact branch
    val ds = spark.range(50).select((col("id") % 10).as("hv")).as[Long]
    val (kUsed, kth) = ds.select(new KmvSketch.KmvAgg(KmvSketch.K).toColumn).head()
    assert(kUsed == 10L && kth == 9L)
    // K=4 over the same data: the 4 smallest of {0..9}
    val (k4, kth4) = ds.select(new KmvSketch.KmvAgg(4).toColumn).head()
    assert(k4 == 4L && kth4 == 3L)
  }
}
