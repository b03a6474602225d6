package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class BloomSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("bloom probe expression: zero false negatives, codegen equals driver eval") {
    val keys = (0L until 5000L).filter(_ % 3 == 0)
    val bloom = keys.toDF("k").stat.bloomFilter("k", keys.length.toLong, 0.01)
    // no false negatives — the property the ingest prefilter relies on
    assert(keys.forall(bloom.mightContainLong))
    // codegen path agrees with the sketch's own answer on every probe
    val probed = (0L until 5000L).toDF("k")
      .select(col("k"), BloomExprs.mightContainLong(bloom, col("k")).as("hit"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    probed.foreach { case (k, hit) => assert(hit == bloom.mightContainLong(k), s"key $k") }
    // false-positive rate in the configured ballpark (not degenerate)
    val fps = probed.count { case (k, hit) => hit && k % 3 != 0 }
    assert(fps < 5000 * 0.05, s"fp count $fps out of range")
    // null-safe
    val r = Seq(Option.empty[Long]).toDF("k")
      .select(BloomExprs.mightContainLong(bloom, col("k"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("bloom-prefiltered ingest equals the plain anti-join exactly") {
    val viaBloom = graft.etl.EtlQueries.ingestBloom(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val plain = graft.etl.EtlQueries.ingestDedup(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(viaBloom == plain, "bloom prefilter must not change the result set")
    assert(viaBloom.nonEmpty)
  }

  test("the probe routes the definitely-new majority around the join") {
    val p = graft.etl.EtlQueries.ingestBloom(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain_long"), "probe must be in the plan")
    assert(p.contains("LeftAnti"), "the maybe-present sliver still anti-joins")
    // in this data ~1/10 of window rows are genuinely new (event_id % 10 == 3
    // is missing from the warehouse); the bloom must pass most of them
    // map-side instead of sending the whole batch through the join
    val id = col("event_id")
    val existing = Tables.events(spark, sf)
      .filter(graft.etl.Synth.inCarto(id)).select("event_id")
    val bloom = existing.stat.bloomFilter("event_id", 100000L, 0.01)
    val newRows = Tables.events(spark, sf).filter(!graft.etl.Synth.inCarto(id))
    val bypassed = newRows
      .filter(!BloomExprs.mightContainLong(bloom, id)).count()
    assert(bypassed > newRows.count() * 9 / 10,
      s"≥90% of genuinely-new rows must bypass the join, got $bypassed/${newRows.count()}")
  }
}
