package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `text_perplexity_buckets` contract: the bucket of every document
  * replays from the REGISTERED `text_lm_score` output under the declared
  * first-character boundary rule; buckets are score-monotone (head scores
  * strictly below middle below tail); the planted frames pin the exact
  * boundary arithmetic; unscorable docs land in 'unscored'. */
class PerplexityBucketsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("buckets replay from the registered lm_score output at sf0.001") {
    val scores = SparkEntry.queries("text_lm_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    val chars = graft.Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hist = scores.toSeq.collect { case (id, Some(s)) => s -> chars(id) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val t = hist.map(_._2).sum
    val starts = hist.scanLeft(0L)(_ + _._2).init
    val bucketOf = hist.zip(starts).map { case ((s, _), start) =>
      s -> (if (3 * start < t) "head" else if (3 * start < 2 * t) "middle" else "tail")
    }.toMap
    val got = SparkEntry.queries("text_perplexity_buckets")(spark, sf).collect()
    assert(got.length == scores.size && got.nonEmpty)
    got.foreach { r =>
      val expect = scores(r.getLong(0)) match {
        case Some(s) => bucketOf(s)
        case None => "unscored"
      }
      assert(r.getString(3) == expect, s"doc ${r.getLong(0)}: ${r.getString(3)} != $expect")
      assert(r.getLong(2) == chars(r.getLong(0)))
    }
    // score monotonicity across buckets
    def scoresIn(b: String) = got.filter(_.getString(3) == b)
      .filterNot(_.isNullAt(1)).map(_.getDouble(1))
    for ((lo, hi) <- Seq(("head", "middle"), ("middle", "tail")))
      if (scoresIn(lo).nonEmpty && scoresIn(hi).nonEmpty)
        assert(scoresIn(lo).max < scoresIn(hi).min,
          s"$lo scores must sit strictly below $hi")
    graft.CacheRegistry.releaseAll()
  }

  private def runOn(rows: Seq[(Long, Option[Double], Long)]): Map[Long, String] = {
    val df = rows.map { case (id, s, c) => (id, s.map(Double.box).orNull, c) }
      .toDF("doc_id", "avg_bits", "n_chars")
      .select(col("doc_id"), col("avg_bits").cast("double"), col("n_chars"))
    val out = PerplexityBuckets.bucketsOf(df).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  test("equal-mass thirds split exactly 1/1/1") {
    val b = runOn(Seq((0L, Some(1.0), 10L), (1L, Some(2.0), 10L), (2L, Some(3.0), 10L)))
    assert(b == Map(0L -> "head", 1L -> "middle", 2L -> "tail"))
  }

  test("boundary rule: a group starting exactly AT T/3 goes middle; just before goes head") {
    // masses (10, 20): T=30; group 2 starts at 10 = T/3 → middle
    val atBoundary = runOn(Seq((0L, Some(1.0), 10L), (1L, Some(2.0), 20L)))
    assert(atBoundary == Map(0L -> "head", 1L -> "middle"))
    // masses (9, 21): group 2 starts at 9 < 10 → head, taking ALL its mass
    val justBefore = runOn(Seq((0L, Some(1.0), 9L), (1L, Some(2.0), 21L)))
    assert(justBefore == Map(0L -> "head", 1L -> "head"))
  }

  test("unscorable docs land in 'unscored', never in tail") {
    val b = runOn(Seq((0L, Some(1.0), 10L), (1L, None, 99L)))
    assert(b(1L) == "unscored")
  }
}
