package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `emb_whiten` contract: whitened axes carry UNIT sample variance and
  * zero cross-covariance (the definition of whitening, checked on the
  * corpus); coordinates are exactly `emb_pca`'s scores scaled by 1/√λ
  * (the family identity); maha2 and the outlier flag replay from the
  * rounded coordinates; and the χ²₈-calibrated threshold flags a small
  * minority, not the corpus. */
class WhitenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private lazy val rows = {
    val r = SparkEntry.queries("emb_whiten")(spark, sf).collect()
    graft.CacheRegistry.releaseAll()
    r
  }
  private val K = Pca.PcDims

  test("whitened axes have unit sample variance and zero cross-covariance") {
    val n = rows.length
    assert(n > 10)
    val w = rows.map(r => (1 to K).map(r.getDouble).toArray)
    for (k <- 0 until K) {
      val m = w.map(_(k)).sum / n
      val v = w.map(x => (x(k) - m) * (x(k) - m)).sum / (n - 1)
      assert(math.abs(v - 1.0) < 1e-3, s"axis $k variance $v != 1")
    }
    for (a <- 0 until K; b <- a + 1 until K) {
      val ma = w.map(_(a)).sum / n
      val mb = w.map(_(b)).sum / n
      val c = w.map(x => (x(a) - ma) * (x(b) - mb)).sum / (n - 1)
      assert(math.abs(c) < 1e-3, s"axes $a,$b covariance $c != 0")
    }
  }

  test("coordinates are emb_pca scores scaled by 1/sqrt(lambda) — the family identity") {
    val Some((_, _, vals, _)) = Pca.trainedModel(spark, sf)
    val pca = SparkEntry.queries("emb_pca")(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 to K).map(r.getDouble).toArray).toMap
    graft.CacheRegistry.releaseAll()
    rows.foreach { r =>
      val p = pca(r.getLong(0))
      for (k <- 0 until K)
        assert(math.abs(r.getDouble(k + 1) - p(k) / math.sqrt(vals(k))) < 1e-5,
          s"vec ${r.getLong(0)} axis $k breaks the scaling identity")
    }
  }

  test("maha2 and is_outlier replay from the rounded coordinates") {
    rows.foreach { r =>
      val m = round6((0 until K).map { k =>
        val w = r.getDouble(k + 1); w * w
      }.sum)
      assert(r.getDouble(K + 1) == m, s"vec ${r.getLong(0)}: maha2 ${r.getDouble(K + 1)} != $m")
      assert(r.getBoolean(K + 2) == (m > Whiten.MahaOutlier))
    }
  }

  test("the chi-squared-calibrated threshold flags a minority of the corpus") {
    val frac = rows.count(_.getBoolean(K + 2)).toDouble / rows.length
    assert(frac < 0.10, s"outlier fraction $frac — threshold is not calibrated")
  }
}
