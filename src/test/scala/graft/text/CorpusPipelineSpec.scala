package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.dedup.DedupClusters

class CorpusPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("corpus build composes the verified stages with the expected cuts") {
    val corpus = CorpusPipeline.build(spark, sf).cache()
    try {
      val total = Tables.documents(spark, sf).count()
      val n = corpus.count()
      assert(n > 0 && n < total, s"pipeline must cut something: $n of $total")

      // benchmark docs are never in the corpus
      assert(corpus.filter(col("doc_id") < 10).count() == 0)

      // non-canonical near-dup cluster members are gone
      val dropped = DedupClusters.clusters(spark, sf)
        .filter(col("doc_id") =!= col("canonical"))
        .collect().map(_.getLong(0)).toSet
      assert(dropped.nonEmpty)
      val ids = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
      assert((ids & dropped).isEmpty, s"cluster dupes leaked: ${ids & dropped}")

      // deterministic: same build twice, same corpus
      val again = CorpusPipeline.build(spark, sf).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(again == ids)

      // quality gate holds
      assert(corpus.filter(col("n_words") < 10).count() == 0)
    } finally { corpus.unpersist(); () }
  }
}
