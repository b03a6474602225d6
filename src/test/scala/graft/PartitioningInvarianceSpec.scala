package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning invariance: every operator's RESULT must be byte-identical
  * when the shuffle-partition count changes (3 vs the suite default) — the
  * order-dependent-float-sum bug class. The determinism checklist demands
  * integer moments / fixed-form IEEE exactly so that aggregation ORDER
  * cannot leak into results; this spec enforces that claim mechanically
  * across the whole surface instead of trusting per-operator discipline. */
class PartitioningInvarianceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // row-sorted, mirroring the driver's sort-then-hash compare: the claim
  // under test is VALUE stability, presentation-tie order is the sort's job
  private def run(name: String): Seq[String] =
    try SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq
    finally CacheRegistry.releaseAll()

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name is invariant to the shuffle-partition count") {
      val default = spark.conf.get("spark.sql.shuffle.partitions")
      val a = run(name)
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val b = run(name)
        assert(a == b, s"$name differs under 3 shuffle partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", default)
    }
  }
}
