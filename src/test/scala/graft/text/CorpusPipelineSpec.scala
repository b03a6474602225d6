package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.dedup.DedupClusters

class CorpusPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("retrieval index chunks exactly the surviving docs with full coverage") {
    val survivors = CorpusPipeline.build(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val idx = CorpusPipeline.buildRetrievalIndex(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(idx.map(_._1).toSet == survivors, "index must cover exactly the cleaned corpus")
    // chunk counts per doc follow the stride contract
    val nWords = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), "\\s+", -1)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    idx.groupBy(_._1).foreach { case (doc, cs) =>
      val expected = (nWords(doc) + TextQueries.ChunkStride - 1) / TextQueries.ChunkStride
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks, expected $expected")
    }
  }

  test("buildBoth (shared cleaned stage) matches the separately-built products") {
    val (packed, retrieval) = CorpusPipeline.buildBoth(spark, sf)
    val packedSep = CorpusPipeline.build(spark, sf)
    assert(packed.collect().map(_.toString).toSeq ==
      packedSep.collect().map(_.toString).toSeq)
    val retrievalSep = CorpusPipeline.buildRetrievalIndex(spark, sf)
    assert(retrieval.collect().map(_.toString).toSeq ==
      retrievalSep.collect().map(_.toString).toSeq)
  }

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

      // packing: chunk spans are contiguous per shard — each doc starts
      // where the previous one in its shard ended
      val rows = corpus.select("shard", "doc_id", "n_words", "start_pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      rows.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.zipWithIndex.foreach { case ((_, _, nw, start), i) =>
          val expected = sorted.take(i).map(_._3).sum
          assert(start == expected, s"doc ${sorted(i)._2}: start=$start expected=$expected")
          val _ = nw
        }
      }
      // chunk ids are consistent with positions
      assert(corpus.filter(col("first_chunk") =!= expr("start_pos div 512")).count() == 0)
    } finally { corpus.unpersist(); () }
  }
}
