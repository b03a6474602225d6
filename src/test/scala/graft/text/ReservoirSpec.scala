package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `sample_reservoir` contract: the sample is the k smallest md5
  * priorities (driver replay), is partitioning-invariant, and the plan is
  * a TakeOrderedAndProject — never a global sort or shuffle. */
class ReservoirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("sample equals the driver-side bottom-k by md5(doc_id)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val all = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).map(id => (md5hex(id.toString), id))
    val expect = all.sorted.take(Reservoir.TargetK).toSeq
    val got = SparkEntry.queries("sample_reservoir")(spark, sf).collect()
      .map(r => (r.getString(3), r.getLong(0))).toSeq
    assert(got == expect)
    assert(got.size == math.min(Reservoir.TargetK, all.length))
  }

  test("partitioning-invariant: a 13-way repartition yields the same sample") {
    import org.apache.spark.sql.functions._
    val base = SparkEntry.queries("sample_reservoir")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val re = graft.Tables.documents(spark, sf).repartition(13)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("priority"))
      .orderBy(col("priority"), col("doc_id")).limit(Reservoir.TargetK)
      .collect().map(_.getLong(0)).toSeq
    assert(base == re)
  }

  test("plan: TakeOrderedAndProject, no exchange") {
    val p = SparkEntry.queries("sample_reservoir")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      "bottom-k must be per-partition heads, not a global sort")
    assert(!p.contains("Exchange"), "the sample must not shuffle the corpus")
  }
}
