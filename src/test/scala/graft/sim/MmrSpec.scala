package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `emb_mmr`: driver-side replay of the greedy chain and the diversity
  * contrast with plain top-k on a corpus with planted near-duplicates. */
class MmrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def r4i(x: Double): Long =
    BigDecimal(x * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb)) // CosineSim's exact arithmetic order
  }

  test("selection equals a driver-side greedy replay") {
    val vecs = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = Mmr.mmr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    for (qid <- vecs.keys.filter(_ < 10)) {
      val rels = vecs.keys.filter(_ != qid).toSeq
        .map(n => n -> r4i(cos(vecs(qid), vecs(n))))
      val cand = rels.sortBy { case (n, r) => (-r, n) }.take(Mmr.CandK)
      var selected = List.empty[Long]
      for (step <- 1 to Mmr.SelectK) {
        val scored = cand.filterNot { case (n, _) => selected.contains(n) }
          .map { case (n, r4) =>
            val si = if (step == 1) 10L * r4
            else {
              val pen4 = selected.map(sid => r4i(cos(vecs(n), vecs(sid)))).max
              Mmr.LambdaNum * r4 - Mmr.MuNum * pen4
            }
            (n, si)
          }
        val (pick, si) = scored.minBy { case (n, sc) => (-sc, n) }
        val score = si.toDouble / 100000.0
        assert(got((qid, step.toLong)) == ((pick, score)),
          s"q$qid step $step: ${got((qid, step.toLong))} vs ($pick,$score)")
        selected = selected :+ pick
      }
    }
  }

  test("near-duplicate top hits are diversified away; top-k keeps them") {
    // corpus: query 0; ids 1..5 near-identical to each other and closest to
    // the query; ids 6..9 distinct directions, moderately relevant
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr").toString
    val base = Array.fill(8)(0.0f)
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = base.clone(); parts.foreach { case (i, x) => a(i) = x }; a
    }
    // block 1..5: the SAME direction (mutual cos = 1); 6..9: equal relevance
    // but mutually-diverse orthogonal components (mutual cos ≈ 0.81) — the
    // geometry where MMR's penalty separates redundancy from diversity
    val rows = Seq(
      0L -> v(0 -> 1.0f),
      1L -> v(0 -> 0.9f, 1 -> 0.436f), 2L -> v(0 -> 0.9f, 1 -> 0.436f),
      3L -> v(0 -> 0.9f, 1 -> 0.436f), 4L -> v(0 -> 0.9f, 1 -> 0.436f),
      5L -> v(0 -> 0.9f, 1 -> 0.436f),
      6L -> v(0 -> 0.9f, 2 -> 0.436f), 7L -> v(0 -> 0.9f, 3 -> 0.436f),
      8L -> v(0 -> 0.9f, 4 -> 0.436f), 9L -> v(0 -> 0.9f, 5 -> 0.436f))
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) AS embedding",
        "cast(vec_id % 3 as int) AS label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val sel = Mmr.mmr(spark, dir).collect()
      .filter(_.getLong(0) == 0L).map(_.getLong(2)).toSet
    // plain top-5 would be exactly the near-dup block {1..5}; MMR must
    // keep its best and swap redundancy for the distinct directions
    assert(sel.intersect(Set(6L, 7L, 8L, 9L)).size >= 3,
      s"MMR kept the redundant block: $sel")
    assert(sel.exists(Set(1L, 2L, 3L, 4L, 5L)), s"most relevant hit dropped: $sel")
  }
}
