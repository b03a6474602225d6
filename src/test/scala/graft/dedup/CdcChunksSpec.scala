package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.HashExprs

class CdcChunksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val (bits, minW, maxW) = (3, 4, 16)

  /** Driver-side replay of the gear recurrence — one shared definition of
    * the boundary rule, independent of the compiled expression. */
  private def chunkReplay(text: String): Seq[String] = {
    val words = text.split("\\s+", -1)
    val mask = (1L << bits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var h = 0L
    for (i <- words.indices) {
      h = (h << 1) + HashExprs.fnv64(words(i).getBytes("UTF-8"))
      val len = i - start + 1
      if ((len >= minW && (h & mask) == 0L) || len >= maxW || i == words.length - 1) {
        out += words.slice(start, i + 1).mkString(" ")
        start = i + 1
        h = 0L
      }
    }
    out.toSeq
  }

  test("compiled chunker equals the driver-side recurrence on the corpus") {
    HashExprs.register(spark)
    val got = Tables.documents(spark, sf)
      .select(col("doc_id"), HashExprs.cdcChunks(col("text")).as("ch"), col("text"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val chunks = r.getSeq[String](1)
      assert(chunks == chunkReplay(r.getString(2)), s"doc ${r.getLong(0)}")
      // chunks partition the document: lossless reassembly
      assert(chunks.mkString(" ") == r.getString(2).split("\\s+", -1).mkString(" "))
      // guards hold for all but the final remainder chunk
      chunks.dropRight(1).foreach { c =>
        val n = c.split(" ").length
        assert(n >= minW && n <= maxW, s"chunk of $n words violates [$minW,$maxW]")
      }
    }
  }

  test("an insertion perturbs only local chunks; fixed windows shift everywhere") {
    val base = (1 to 200).map(i => s"w${i * 37 % 101}x$i").mkString(" ")
    val edited = {
      val ws = base.split(" ")
      (ws.take(100) :+ "INSERTED").concat(ws.drop(100)).mkString(" ")
    }
    val a = chunkReplay(base).toSet
    val b = chunkReplay(edited).toSet
    val shared = (a & b).size
    assert(shared.toDouble / a.size >= 0.5,
      s"CDC must re-synchronize after an edit: only $shared/${a.size} chunks survive")
    // the fixed-window chunking of dedup_rewrite loses everything after the
    // insertion point — the contrast that motivates this operator
    def fixed(t: String) = t.split(" ").grouped(DedupQueries.RewriteSpan).map(_.mkString(" ")).toSet
    val fShared = (fixed(base) & fixed(edited)).size
    assert(fShared.toDouble / fixed(base).size < shared.toDouble / a.size,
      "fixed windows should share fewer chunks than CDC after an insertion")
  }

  test("dedup_cdc_chunks reports only cross-document digests and counts add up") {
    val df = DedupQueries.cdcDedup(spark, sf).collect()
    df.foreach { r =>
      assert(r.getLong(1) > 1) // n_docs
      assert(r.getLong(2) >= r.getLong(1)) // occurrences ≥ docs
      assert(r.getLong(3) <= r.getLong(4)) // min_doc ≤ max_doc
    }
    // the synthetic corpus repeats content: the report must be non-empty
    assert(df.nonEmpty)
  }
}
