package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EmbProjectSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("projection is a pure map-side codegen pass: no shuffle, no HOF fallback") {
    val df = VectorOps.embProject(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"))
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      "512-term projection must not fall out of whole-stage codegen")
  }

  test("projection matches an independent Scala recompute exactly (up to rounding)") {
    import org.apache.spark.sql.functions._
    val projected = VectorOps.embProject(spark, sf).collect()
      .map(r => r.getLong(0) -> (0 until 8).map(k => r.getDouble(k + 1)).toArray).toMap
    val orig = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(projected.keySet == orig.keySet)
    orig.foreach { case (id, emb) =>
      (0 until 8).foreach { k =>
        val expected = emb.indices.foldLeft(0.0)((acc, j) => acc + emb(j) * VectorOps.testWeight(k, j))
        val rounded = BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(projected(id)(k) - rounded) < 1e-9,
          s"vec $id p$k: got ${projected(id)(k)}, expected $rounded")
      }
    }
  }
}
