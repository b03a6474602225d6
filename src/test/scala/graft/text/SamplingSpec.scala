package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("temperature sampling upsamples low-resource languages relative to their share") {
    import org.apache.spark.sql.functions._
    val corpus = graft.Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = TextQueries.sampleTemperature(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val biggest = corpus.maxBy(_._2)._1
    val smallest = corpus.minBy(_._2)._1
    assert(corpus(biggest) > 2 * corpus(smallest), "test corpus must actually be skewed")
    // keep-rate of the low-resource language must exceed the high-resource one
    val rSmall = sampled.getOrElse(smallest, 0L).toDouble / corpus(smallest)
    val rBig = sampled.getOrElse(biggest, 0L).toDouble / corpus(biggest)
    assert(rSmall > rBig, s"α-sampling must favor $smallest ($rSmall) over $biggest ($rBig)")
    // and it is a sample, not a copy
    assert(sampled.values.sum < corpus.values.sum)
  }

  test("temperature sampling is deterministic") {
    val a = TextQueries.sampleTemperature(spark, sf).collect().map(_.toString).toSeq
    val b = TextQueries.sampleTemperature(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
