package graft.text

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Generative check of `sample_pps_systematic`: on random weight profiles
  * (skewed, zero-heavy, certainty-stratum giants) the two-level
  * distributed prefix sum must equal the single-cumsum driver replay, and
  * Madow's invariants must hold exactly: Σcopies = totalW div step, and
  * every doc's copies ∈ {⌊w/step⌋, ⌊w/step⌋+1}. Fixed-seed generator
  * loop (no scalatest-scalacheck bridge offline). */
class PpsPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wGen = Gen.frequency(
    (4, Gen.chooseNum(0L, 400L)),        // typical docs
    (1, Gen.const(0L)),                  // empty docs
    (1, Gen.chooseNum(20000L, 90000L)))  // giants (certainty stratum)

  private def weights(seed: Long, n: Int): Seq[Long] =
    (0 until n).map(i => LazyList.from(0).flatMap(j =>
      wGen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed + i * 17 + j))).head)

  test("random weight profiles: distributed result equals the single-cumsum replay") {
    for (seed <- 1L to 6L) {
      val n = 50 + (seed * 211 % 4000).toInt
      val ws = weights(seed * 5000, n)
      val d = java.nio.file.Files.createTempDirectory(s"ppsp$seed").toString
      ws.zipWithIndex.map { case (w, i) =>
        (i.toLong, "x" * math.min(w, 3L).toInt, "en", "t", w)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      val totW = ws.sum
      val step = math.max(totW / PpsSample.TargetN, 1L)
      var cum = 0L
      val expect = ws.zipWithIndex.flatMap { case (w, i) =>
        val before = cum; cum += w
        val copies = cum / step - before / step
        if (copies >= 1) Some((i.toLong, w, copies)) else None
      }
      val got = SparkEntry.queries("sample_pps_systematic")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect, s"seed $seed n=$n")
      // Madow invariants
      assert(got.map(_._3).sum == totW / step, "exact sample size")
      got.foreach { case (_, w, c) =>
        assert(c == w / step || c == w / step + 1, "copies within PPS band")
      }
      ws.zipWithIndex.filter(_._1 >= step).foreach { case (_, i) =>
        assert(got.exists(_._1 == i.toLong), "certainty stratum always selected")
      }
    }
  }
}
