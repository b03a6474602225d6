package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SkewToolsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("salted aggregation equals plain aggregation on skewed data") {
    // event_type is low-cardinality (5 values over all rows) — max skew
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy(col("event_type").as("k"))
      .agg(sum(col("value")).as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
    val salted = SkewTools.saltedSum(ev, col("event_type"), col("value"), buckets = 8)
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salt spreads even when the hot key carries one constant value") {
    // hashing the VALUE would land every hot-key row in one salt bucket;
    // the row-id salt must spread them regardless
    val hot = (0L until 10000L).map(_ => ("hot", 1.0)) ++ Seq(("cold", 2.0))
    val df = hot.toDF("k", "v")
    val res = SkewTools.saltedSum(df, col("k"), col("v"), buckets = 8)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(res("hot") == ((10000.0, 10000L)) && res("cold") == ((2.0, 1L)))
    // measure the spread directly: partials per (k, salt) with the default salt
    val spread = df
      .select(col("k"), pmod(xxhash64(monotonically_increasing_id()), lit(8)).as("_salt"))
      .filter(col("k") === "hot")
      .groupBy(col("_salt")).count().collect()
    assert(spread.length >= 4, s"constant-value hot key must still use several salts, got ${spread.length}")
    // the old value-hash salt demonstrably collapses (regression guard on intent)
    val collapsed = df.select(pmod(xxhash64(col("v")), lit(8)).as("_salt"))
      .filter(col("_salt").isNotNull).distinct().count()
    assert(collapsed <= 2, "value-hash salt on constant values collapses — which is why it is not used")
  }

  test("salted join equals plain join and actually spreads the hot key") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("event_type"))
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 2.0), ("error", 0.1))
      .toDF("event_type", "weight")
    val plain = ev.join(dim, "event_type")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("weight"))).toSet
    val saltedDf = SkewTools.saltedJoin(ev, dim, "event_type", buckets = 8, spreadBy = col("event_id"))
    val salted = saltedDf
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("weight"))).toSet
    assert(salted == plain)

    // the salt really spreads: each event_type appears under several salts
    val spread = ev.withColumn("_salt", pmod(xxhash64(col("event_id")), lit(8)))
      .groupBy("event_type").agg(countDistinct(col("_salt")).as("n_salts"))
      .collect().map(_.getLong(1))
    assert(spread.forall(_ >= 4), s"hot keys must spread over salts, got ${spread.toSeq}")
  }
}
