package graft

import org.scalatest.funsuite.AnyFunSuite

/** `ScopedConf` hygiene (r16): the window applies exactly inside the
  * body and the EFFECTIVE value is indistinguishable before/after —
  * including the explicitly-set, default-only, and exception paths
  * (the `InterpretedLoopSpec` contract, applied to the advisory-size
  * window `graph_anf` uses to keep its register merges wide). */
class ScopedConfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("scoped value applies inside the window, effective value restores after") {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val before = spark.conf.get(key)
    ScopedConf.run(spark, key, "1m") {
      assert(spark.conf.get(key) == "1m")
    }
    assert(spark.conf.get(key) == before)
  }

  test("unset-before stays unset after; set-before restores the set value") {
    val key = "spark.graft.scopedconf.probe"
    ScopedConf.run(spark, key, "a") { assert(spark.conf.get(key) == "a") }
    assert(spark.conf.getOption(key).isEmpty, "unset key must stay unset")
    spark.conf.set(key, "z")
    try {
      ScopedConf.run(spark, key, "a") { assert(spark.conf.get(key) == "a") }
      assert(spark.conf.get(key) == "z", "explicit value must restore")
    } finally spark.conf.unset(key)
  }

  test("restores even when the body throws") {
    val key = "spark.graft.scopedconf.probe2"
    intercept[RuntimeException] {
      ScopedConf.run(spark, key, "a") { throw new RuntimeException("boom") }
    }
    assert(spark.conf.getOption(key).isEmpty)
  }
}
