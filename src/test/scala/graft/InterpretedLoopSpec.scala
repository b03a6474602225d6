package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the gated interpreted-loop toggle (VERDICT r12 #4): the
  * session's EFFECTIVE codegen conf is identical before and after any
  * iterative builder returns (`getOption` on a defaulted SQL conf always
  * answers the default, so effective-value equality is the strongest
  * observable restore contract), the 100 TB posture and the row ceiling
  * both bypass the toggle entirely, and gating the toggle changes no
  * output. */
class InterpretedLoopSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private val WscKey = "spark.sql.codegen.wholeStage"

  test("session conf untouched after iterative builders return: effective value restored exactly") {
    val before = spark.conf.get(WscKey)
    assert(SparkEntry.queries("graph_pagerank")(spark, sf).collect().nonEmpty)
    assert(spark.conf.get(WscKey) == before,
      "the effective conf after the builder returns must equal the value before it entered")
    spark.conf.set(WscKey, "true")
    try {
      assert(SparkEntry.queries("graph_kcore")(spark, sf).collect().nonEmpty)
      assert(spark.conf.get(WscKey) == "true", "an explicit user value must survive exactly")
    } finally spark.conf.set(WscKey, before)
  }

  test("100 TB posture short-circuits: codegen stays on and the row count is never evaluated") {
    spark.conf.set(ScaleMode.Key, "true")
    try {
      var counted = false
      val seen = InterpretedLoop.run(spark, { counted = true; 0L }) {
        spark.conf.get(WscKey)
      }
      assert(!counted, "the scale posture must answer before paying the count action")
      assert(seen != "false", s"codegen must stay on under the scale posture: $seen")
    } finally spark.conf.unset(ScaleMode.Key)
  }

  test("row ceiling: above it codegen stays on, below it the body sees off and restore is exact") {
    val before = spark.conf.get(WscKey)
    val above = InterpretedLoop.run(spark, InterpretedLoop.maxRows(spark) + 1) {
      spark.conf.get(WscKey)
    }
    assert(above != "false", s"a big working set keeps codegen: $above")
    val below = InterpretedLoop.run(spark, 10L) { spark.conf.get(WscKey) }
    assert(below == "false", "a small working set runs the loop interpreted")
    assert(spark.conf.get(WscKey) == before, "effective restore after the window closes")
  }

  test("concurrent builders never leak the off state past their own window") {
    val before = spark.conf.get(WscKey)
    val threads = (1 to 4).map { i =>
      new Thread(() => InterpretedLoop.run(spark, 10L) {
        assert(spark.conf.get(WscKey) == "false")
        Thread.sleep(20L * (i % 2))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(spark.conf.get(WscKey) == before,
      "after every builder finished, the session conf is untouched")
  }

  test("reentrancy: a loop composing another loop restores the OUTER window's off state") {
    val before = spark.conf.get(WscKey)
    val innerSeen = InterpretedLoop.run(spark, 10L) {
      InterpretedLoop.run(spark, 10L) { spark.conf.get(WscKey) } -> spark.conf.get(WscKey)
    }
    assert(innerSeen == ("false" -> "false"),
      "inner window runs interpreted AND its restore re-asserts the outer off state")
    assert(spark.conf.get(WscKey) == before)
  }

  test("gating the toggle changes no output: pagerank and dedup_clusters identical under the scale posture") {
    def snap(q: String): Seq[String] = {
      val rows = SparkEntry.queries(q)(spark, sf).collect().map(_.toString).sorted.toSeq
      CacheRegistry.releaseAll()
      rows
    }
    val off = (snap("graph_pagerank"), snap("dedup_clusters"))
    spark.conf.set(ScaleMode.Key, "true")
    try {
      assert(snap("graph_pagerank") == off._1, "pagerank output must not depend on the gate")
      assert(snap("dedup_clusters") == off._2, "clusters output must not depend on the gate")
    } finally spark.conf.unset(ScaleMode.Key)
  }
}
