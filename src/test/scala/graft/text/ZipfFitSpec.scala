package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `text_zipf_fit` contract: the OLS fit replays driver-side from the
  * integerized log moments, the slope is negative (frequency falls with
  * rank by construction) with R² in [0,1], and a planted perfect-Zipf
  * corpus fits slope ≈ −1 at R² ≈ 1. */
class ZipfFitSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def replay(points: Seq[(Long, Long)]): (Double, Double) = {
    val n = points.length.toLong
    val sx = points.map(_._1).sum; val sy = points.map(_._2).sum
    val sxy = points.map(p => p._1 * p._2).sum
    val sxx = points.map(p => p._1 * p._1).sum
    val syy = points.map(p => p._2 * p._2).sum
    val dxx = (n * sxx - sx * sx).toDouble
    val dyy = (n * syy - sy * sy).toDouble
    val dxy = (n * sxy - sx * sy).toDouble
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    (r4(dxy / dxx), r4(dxy * dxy / (dxx * dyy)))
  }

  test("fit replays from the integerized log moments per language") {
    val counts = graft.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split("\\s+", -1).map(w => (r.getString(0), w)))
      .groupBy(identity).map { case ((l, w), v) => (l, w, v.size.toLong) }.toSeq
    val points = counts.groupBy(_._1).map { case (l, ws) =>
      l -> ws.sortBy(t => (-t._3, t._2)).take(ZipfFit.MaxRanks).zipWithIndex.map {
        case ((_, _, c), i) =>
          def ilog(v: Long): Long =
            java.math.BigDecimal.valueOf(math.log(v.toDouble) * ZipfFit.LogScale)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          (ilog(i + 1L), ilog(c))
      }
    }
    val got = SparkEntry.queries("text_zipf_fit")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (l, n, slope, r2) = (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      val pts = points(l)
      assert(n == pts.length.toLong)
      assert((slope, r2) == replay(pts), s"lang $l fit diverged")
      assert(slope < 0.0, "frequency falls with rank")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("degenerate corpus (all counts equal, dyy = 0) keeps the row with r2 NULL") {
    // every word appears exactly once: ranks differ (dxx > 0) but all
    // log-counts are 0 (dyy = 0). Unguarded, Spark's non-ANSI Divide gives
    // NULL while DuckDB's IEEE division gives NaN — the ADVICE r10 finding.
    // The guard must keep the row (slope defined) and NULL the r2 in BOTH
    // engines.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("zipf_degen").toString
    val text = (1 to 10).map(k => s"u$k").mkString(" ")
    Seq((0L, text, "xx", "synth", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_zipf_fit")(spark, d).collect()
    assert(got.length == 1, "the degenerate language must still report")
    assert(got.head.getDouble(2) == 0.0, "flat counts fit slope 0")
    assert(got.head.isNullAt(3), "r2 undefined when dyy = 0 — NULL, not NaN/inf")
  }

  test("planted perfect-Zipf corpus fits slope ~ -1 at r2 ~ 1") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("zipf").toString
    // word k appears floor(1200/k) times: exact Zipf with s = 1
    val words = (1 to 50).flatMap(k => Seq.fill(1200 / k)(s"w$k"))
    val text = words.mkString(" ")
    Seq((0L, text, "en", "synth", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_zipf_fit")(spark, d).collect()
    assert(got.length == 1)
    val (slope, r2) = (got.head.getDouble(2), got.head.getDouble(3))
    assert(math.abs(slope + 1.0) < 0.05, s"slope $slope should be ~ -1")
    assert(r2 > 0.99, s"r2 $r2 should be ~ 1")
  }
}
