package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `dedup_rewrite` is exact (global first-occurrence keeper over disjoint
  * chunk digests), so the spec replays the whole definition driver-side at
  * sf0.001 and demands equality, plus pins the invariants that make the
  * rewrite a rewrite: kept ≤ total, text shrinks only by whole chunks, and
  * duplicated chunks survive exactly once corpus-wide. */
class RewriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val Span = DedupQueries.RewriteSpan

  private lazy val corpus: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

  private lazy val truth: Map[Long, (Long, Long, String)] = {
    val inst = corpus.flatMap { case (id, text) =>
      val w = text.split("\\s+")
      val nc = math.ceil(w.length.toDouble / Span).toLong
      (0L until nc).map(p =>
        (id, p, w.slice((p * Span).toInt, (p * Span).toInt + Span).mkString(" ")))
    }
    val firstK = inst.groupBy(t => java.security.MessageDigest.getInstance("MD5")
        .digest(t._3.getBytes("UTF-8")).toSeq)
      .map { case (_, is) => is.map { case (id, p, _) => id * DedupQueries.RewritePosCap + p }.min }
      .toSet
    corpus.map { case (id, text) =>
      val w = text.split("\\s+")
      val nc = math.ceil(w.length.toDouble / Span).toLong
      val kept = (0L until nc)
        .map(p => (p, w.slice((p * Span).toInt, (p * Span).toInt + Span).mkString(" ")))
        .filter { case (p, _) => firstK.contains(id * DedupQueries.RewritePosCap + p) }
      id -> (nc, kept.size.toLong, kept.map(_._2).mkString(" "))
    }.toMap
  }

  private lazy val got: Map[Long, (Long, Long, String)] =
    DedupQueries.rewrite(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("distributed rewrite equals the driver-side replay exactly") {
    assert(got.keySet == truth.keySet)
    got.foreach { case (id, g) =>
      assert(g == truth(id), s"doc $id: $g != ${truth(id)}")
    }
  }

  test("duplicated chunks survive exactly once corpus-wide") {
    val keptChunks = got.values.toSeq.flatMap(_._3.split(" ").grouped(Span).map(_.mkString(" ")))
    // reconstruct chunk multiset from cleaned text is lossy at boundaries;
    // instead recount from the definition: every digest's global kept count
    val inst = corpus.flatMap { case (id, text) =>
      val w = text.split("\\s+")
      val nc = math.ceil(w.length.toDouble / Span).toInt
      (0 until nc).map(p => w.slice(p * Span, p * Span + Span).mkString(" "))
    }
    val digests = inst.groupBy(identity)
    val totalKept = got.values.map(_._2).sum
    assert(totalKept == digests.size.toLong,
      "kept chunk instances must equal the number of distinct chunk digests")
    assert(keptChunks.nonEmpty)
    // and something was actually dropped (the synthetic corpus repeats chunks)
    assert(totalKept < inst.size.toLong, "corpus must contain duplicated chunks")
  }
}
