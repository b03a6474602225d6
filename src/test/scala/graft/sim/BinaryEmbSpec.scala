package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `emb_binarize` / `ann_hamming_rerank` contracts: exact planted codes
  * (including the bit-63 sign-bit packing), popcounts, Hamming ordering,
  * measured recall against the exact brute-force baseline, and the
  * sliver-only rerank plan. */
class BinaryEmbSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("planted geometry: packed codes, sign bit, popcounts") {
    val dim = BinaryEmb.Dim
    // corpus of three vectors: all-zero, all-one, even-dims-one.
    // mids = 0.5 everywhere → codes 0, -1 (all 64 bits), 0x5555…5555
    val d = java.nio.file.Files.createTempDirectory("binemb").toString
    Seq(
      0L -> Seq.fill(dim)(0.0),
      1L -> Seq.fill(dim)(1.0),
      2L -> Seq.tabulate(dim)(i => if (i % 2 == 0) 1.0 else 0.0))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("emb_binarize")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (0L, 0L, 0L),
      (1L, -1L, 64L),                    // all bits incl. bit 63 = sign
      (2L, 0x5555555555555555L, 32L)))
  }

  test("corpus codes equal a driver replay of midrange thresholds") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val dim = e.head._2.length
    val mids = Array.tabulate(dim) { i =>
      val c = e.map(_._2(i)); (c.min + c.max) / 2.0
    }
    val expect = e.map { case (id, v) =>
      val code = (0 until dim).foldLeft(0L)((acc, i) =>
        if (v(i) > mids(i)) acc + (1L << i) else acc)
      (id, code, java.lang.Long.bitCount(code).toLong)
    }.toSeq
    val got = SparkEntry.queries("emb_binarize")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("hamming rerank: exact cosines, descending rank order, measured recall vs brute") {
    val brute = SparkEntry.queries("ann_topk_brute")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val got = SparkEntry.queries("ann_hamming_rerank")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    graft.CacheRegistry.releaseAll()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until BinaryEmb.NQueries).toSet)
    for ((q, rows) <- byQ) {
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"query $q: cosines must descend with rank")
      assert(sorted.length == BinaryEmb.K)
    }
    // recall@10 of the 50-candidate Hamming prefilter vs exact brute force:
    // the sketch must beat random by a wide margin (random ≈ 50/500 = 0.1)
    val recalls = byQ.map { case (q, rows) =>
      rows.map(_._2).toSet.intersect(brute(q)).size.toDouble / 10.0 }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@10 vs brute too low: $mean")
  }

  test("rerank plan: no cartesian, candidate sliver broadcast back, codes cached once") {
    val p = SparkEntry.queries("ann_hamming_rerank")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    graft.CacheRegistry.releaseAll()
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      "query codes and candidate ids must broadcast")
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      "both Hamming-join sides must read the cached code frame")
  }
}
