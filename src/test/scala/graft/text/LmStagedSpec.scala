package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The staged LM-ladder contract (r13 verdict task #8): the add-one bigram
  * chain behind `text_lm_score` is materialized once per (corpus,
  * fingerprint) and READ — not re-run — by its registered consumers
  * (`text_lm_eval` shares the bigram rung; `text_perplexity_buckets` and
  * `sample_curriculum` share the scored rung), with the family
  * supersede-eviction lifecycle. */
class LmStagedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def checkpointRddId(df: DataFrame): Int =
    df.queryExecution.logical.collect { case lr: LogicalRDD => lr.rdd.id }.head

  test("consumers read the rung: one scored materialization serves lm_score, buckets, curriculum") {
    LmScore.clearLmCache()
    val scored = LmScore.stagedScored(spark, sf)
    val rddId = checkpointRddId(scored)
    // the registered consumers run end-to-end WITHOUT superseding the rung
    val ppx = graft.SparkEntry.queries("text_perplexity_buckets")(spark, sf).collect()
    val cur = graft.SparkEntry.queries("sample_curriculum")(spark, sf)
      .select(col("doc_id"), col("diff_mbits")).collect()
    graft.CacheRegistry.releaseAll()
    assert(ppx.nonEmpty && cur.nonEmpty)
    assert(LmScore.stagedScored(spark, sf) eq scored,
      "consumers must reuse the staged scored frame, not rebuild it")
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "the rung's checkpoint must survive consumer cache releases")
    // composition correctness: curriculum's difficulty derives from the
    // rung's exact integers — (total_bits * 1000) div n_bigrams
    val base = scored.select(col("doc_id"), col("n_bigrams"), col("total_bits"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    cur.foreach { r =>
      val (nb, tb) = base(r.getLong(0))
      val exp = if (nb > 0) (tb * 1000L) / nb else 0L
      assert(r.getLong(1) == exp, s"doc ${r.getLong(0)} difficulty drifted from the rung")
    }
    // lm_eval shares the BIGRAM rung (same object on re-resolve)
    val bg = LmScore.stagedBigrams(spark, sf)
    graft.SparkEntry.queries("text_lm_eval")(spark, sf).collect()
    graft.CacheRegistry.releaseAll()
    assert(LmScore.stagedBigrams(spark, sf) eq bg)
    LmScore.clearLmCache()
  }

  test("corpus rewrite supersedes the LM rungs; clearLmCache releases them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lm_rung").toString
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    write(Seq("a b c a b", "b c d"))
    val v1 = LmScore.stagedScored(spark, dir)
    val id1 = checkpointRddId(v1)
    assert(v1.count() == 2)
    write(Seq("x y z", "y z w", "z w q"))
    val v2 = LmScore.stagedScored(spark, dir)
    assert(!(v2 eq v1) && v2.count() == 3, "rewrite must re-stage")
    assert(!spark.sparkContext.getPersistentRDDs.contains(id1),
      "stale scored rung must be evicted on supersede")
    val id2 = checkpointRddId(v2)
    LmScore.clearLmCache()
    assert(!spark.sparkContext.getPersistentRDDs.contains(id2))
  }
}
