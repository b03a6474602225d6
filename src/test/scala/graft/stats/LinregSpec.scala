package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `stats_linreg` contract: coefficients and R² replay from first
  * principles (the same nine moments, the same Cramer cofactor order) on
  * the corpus; planted frames pin an exact fit recovered exactly
  * (b = (100, 2, 3), R² = 1.0 — every intermediate stays integer-exact
  * in double), the collinear NULL guard, and the zero-variance-response
  * NULL R² with exact zero slopes. */
class LinregSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def roundAt(x: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Pure-Scala replica: same moments, same cofactor expansion. */
  private def replica(rows: Seq[(Long, Long, Long)])
    : (Long, Option[Double], Option[Double], Option[Double], Option[Double]) = {
    val n = rows.size.toLong
    def s(f: ((Long, Long, Long)) => Long) = rows.map(f).sum
    val (s1, s2) = (s(_._2), s(_._3))
    val (s11, s12, s22) = (s(r => r._2 * r._2), s(r => r._2 * r._3), s(r => r._3 * r._3))
    val (sy, s1y, s2y, syy) = (s(_._1), s(r => r._2 * r._1), s(r => r._3 * r._1),
      s(r => r._1 * r._1))
    val (dn, d1, d2, d11, d12, d22) =
      (n.toDouble, s1.toDouble, s2.toDouble, s11.toDouble, s12.toDouble, s22.toDouble)
    val (dy, d1y, d2y, dyy) = (sy.toDouble, s1y.toDouble, s2y.toDouble, syy.toDouble)
    def det3(a: Array[Array[Double]]): Double =
      a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
        a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
        a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
    val aM = Array(Array(dn, d1, d2), Array(d1, d11, d12), Array(d2, d12, d22))
    val b = Array(dy, d1y, d2y)
    def repl(j: Int) = Array.tabulate(3, 3)((r, c) => if (c == j) b(r) else aM(r)(c))
    val det = det3(aM)
    val sst = dyy - dy * dy / dn
    if (math.abs(det) <= 1e-6) (n, None, None, None, None)
    else {
      val (b0c, b1c, b2c) = (det3(repl(0)) / det, det3(repl(1)) / det, det3(repl(2)) / det)
      val r2 = if (sst > 0)
        Some(roundAt(1.0 - (dyy - b0c * dy - b1c * d1y - b2c * d2y) / sst, 6)) else None
      (n, Some(roundAt(b0c / 100.0, 4)), Some(roundAt(b1c / 100.0, 4)),
        Some(roundAt(b2c / 100.0, 4)), r2)
    }
  }

  private def check(r: org.apache.spark.sql.Row,
      e: (Long, Option[Double], Option[Double], Option[Double], Option[Double])): Unit = {
    assert(r.getLong(1) == e._1)
    def cmp(i: Int, o: Option[Double]): Unit = o match {
      case Some(v) => assert(r.getDouble(i) == v, s"col $i: ${r.getDouble(i)} != $v")
      case None => assert(r.isNullAt(i), s"col $i must be NULL: $r")
    }
    cmp(2, e._2); cmp(3, e._3); cmp(4, e._4); cmp(5, e._5)
  }

  test("coefficients and R2 replay from first principles on the corpus at sf0.001") {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.events(spark, sf).select(col("event_type"),
        round(round(col("value"), 2) * 100).cast("long").as("y"),
        hour(col("ts")).cast("long").as("x1"),
        ((datediff(to_date(col("ts")), lit("1970-01-01")).cast("long") + 3) % 7).as("x2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = SparkEntry.queries("stats_linreg")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val rows = base.filter(_._1 == r.getString(0)).map(t => (t._2, t._3, t._4)).toSeq
      check(r, replica(rows))
    }
  }

  private def runOn(rows: Seq[(String, Long, Long, Long)]) = {
    val out = Linreg.linregOf(rows.toDF("event_type", "y", "x1", "x2")).collect()
    out.map(r => r.getString(0) -> r).toMap
  }

  test("exact fit y = 10000 + 200 x1 + 300 x2 cents recovers (100, 2, 3) and R2 = 1 exactly") {
    val rows = for (x1 <- 0L to 3L; x2 <- 0L to 2L)
      yield ("fit", 10000L + 200L * x1 + 300L * x2, x1, x2)
    val r = runOn(rows)("fit")
    assert(r.getDouble(2) == 100.0 && r.getDouble(3) == 2.0 && r.getDouble(4) == 3.0)
    assert(r.getDouble(5) == 1.0)
  }

  test("collinear covariates yield NULL coefficients, never a fake fit") {
    val rows = (0L until 10L).map(i => ("col", 100L * i, i, i))
    val r = runOn(rows)("col")
    (2 to 5).foreach(i => assert(r.isNullAt(i), s"col $i must be NULL: $r"))
  }

  test("constant response: zero slopes exactly, NULL R2") {
    val rows = for (x1 <- 0L to 3L; x2 <- 0L to 2L) yield ("const", 5000L, x1, x2)
    val r = runOn(rows)("const")
    assert(r.getDouble(2) == 50.0 && r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    assert(r.isNullAt(5), s"zero response variance must not report an R2: $r")
  }
}
