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

  test("attrition report telescopes and reconciles with the pipeline it describes") {
    val rep = CorpusPipeline.pipelineReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rep.map(_._2).toSeq == Seq("1_quality", "2_exact_dedup", "3_neardup",
      "4_decontaminate", "5_sample"), "five ordered stage rows")
    // stage 1 sees the whole corpus
    assert(rep.head._3 == Tables.documents(spark, sf).count())
    // telescoping: every stage's output is the next stage's input
    rep.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 == b._3, s"n_out(${a._2}) must equal n_in(${b._2})")
    }
    // arithmetic: n_out = n_in - n_dropped, nothing negative
    rep.foreach { case (_, st, in, drop, out) =>
      assert(out == in - drop && drop >= 0 && out >= 0, s"stage $st inconsistent")
    }
    // the report's survivor count IS the pipeline's output size
    assert(rep.last._5 == CorpusPipeline.cleaned(spark, sf).count(),
      "n_out of the last stage must equal |cleaned|")
    // and the gates actually cut something on this corpus
    assert(rep.map(_._4).sum > 0, "at least one stage must drop documents")
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
