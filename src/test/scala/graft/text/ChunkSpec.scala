package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("chunks tile every document: full windows on stride, short tail, contiguous idx") {
    import org.apache.spark.sql.functions._
    val chunks = TextQueries.chunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docWords = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), "\\s+", -1)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_._2)
      // contiguous chunk_idx 0..k, start = idx * stride
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, idx, start, _) =>
        assert(start == idx * TextQueries.ChunkStride)
      }
      // every chunk but the tail is exactly ChunkWords long; tail is 1..ChunkWords
      sorted.init.foreach { case (_, _, start, n) =>
        assert(start + n >= docWords(docId) || n == TextQueries.ChunkWords,
          s"doc $docId: interior chunk at $start has $n words")
      }
      val (_, _, lastStart, lastN) = sorted.last
      assert(lastN >= 1 && lastN <= TextQueries.ChunkWords)
      // the last chunk reaches the end of the document
      assert(lastStart + lastN == docWords(docId),
        s"doc $docId: coverage ends at ${lastStart + lastN} of ${docWords(docId)} words")
    }
  }

  test("consecutive chunks overlap by ChunkWords - ChunkStride words") {
    assert(TextQueries.ChunkWords > TextQueries.ChunkStride,
      "windows must overlap for RAG-style chunking")
  }

  test("chunking plan has no shuffle before the final presentation sort") {
    val p = TextQueries.chunk(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      "chunking must be scan -> project -> generate, shuffle-free")
    assert(p.contains("Generate explode"), "explode is the only row multiplier")
  }
}
