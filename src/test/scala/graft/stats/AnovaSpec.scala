package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `stats_anova` contract: the F readout replays from first principles
  * (same rounded group terms, same fixed forms) on the corpus; planted
  * frames pin identical groups (SSB = 0 exactly, no difference),
  * perfectly separated constants (SSW = 0 → NULL F but differs = true),
  * a textbook separated/noisy case that must trip the χ² verdict, and
  * the single-group guard. */
class AnovaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def replica(rows: Seq[(String, Long)])
    : (Long, Long, Double, Double, Option[Double], Option[Boolean]) = {
    val g = rows.groupBy(_._1).values.map { v =>
      val ys = v.map(_._2)
      val (ng, sg, ssg) = (ys.size.toLong, ys.sum, ys.map(y => y * y).sum)
      (ng, sg, ssg, math.round(sg.toDouble * sg.toDouble / ng))
    }.toSeq
    val k = g.size.toLong
    val n = g.map(_._1).sum
    val s = g.map(_._2).sum
    val ss = g.map(_._3).sum
    val st = g.map(_._4).sum
    val ssbI = st - math.round(s.toDouble * s.toDouble / n)
    val sswI = ss - st
    val fr = if (k >= 2 && sswI > 0)
      Some((ssbI.toDouble / (k - 1)) / (sswI.toDouble / (n - k))) else None
    val differs: Option[Boolean] =
      if (k < 2) Some(false)
      else if (sswI > 0) {
        if (k - 1 <= Anova.Chi2Crit99.size)
          Some((k - 1) * fr.get > Anova.Chi2Crit99((k - 2).toInt)) else None
      } else Some(ssbI > 0)
    (k, n, round4(ssbI.toDouble / 1e4), round4(sswI.toDouble / 1e4),
      fr.map(round4), differs)
  }

  private def check(r: org.apache.spark.sql.Row,
      e: (Long, Long, Double, Double, Option[Double], Option[Boolean])): Unit = {
    assert(r.getLong(0) == e._1 && r.getLong(1) == e._2)
    assert(r.getDouble(2) == e._3 && r.getDouble(3) == e._4)
    e._5 match {
      case Some(v) => assert(r.getDouble(4) == v)
      case None => assert(r.isNullAt(4))
    }
    e._6 match {
      case Some(v) => assert(r.getBoolean(5) == v)
      case None => assert(r.isNullAt(5))
    }
  }

  test("the F readout replays from first principles on the corpus at sf0.001") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.events(spark, sf).select(col("event_type"),
        round(round(col("value"), 2) * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = SparkEntry.queries("stats_anova")(spark, sf).collect()
    assert(got.length == 1)
    check(got.head, replica(rows))
  }

  private def runOn(rows: Seq[(String, Long)]) =
    Anova.anovaOf(rows.toDF("event_type", "y")).collect().head

  test("identical groups: SSB = 0 exactly, no difference claimed") {
    val rows = for (g <- Seq("a", "b", "c"); y <- Seq(100L, 200L, 300L)) yield (g, y)
    val r = runOn(rows)
    assert(r.getDouble(2) == 0.0 && !r.getBoolean(5))
  }

  test("perfectly separated constants: SSW = 0, NULL F, differs = true") {
    val rows = Seq.fill(5)(("a", 100L)) ++ Seq.fill(5)(("b", 900L))
    val r = runOn(rows)
    assert(r.getDouble(3) == 0.0 && r.isNullAt(4) && r.getBoolean(5))
  }

  test("separated noisy groups trip the chi-squared verdict; replica agrees exactly") {
    val rows = (0L until 20L).map(i => ("lo", 100L + (i % 5))) ++
      (0L until 20L).map(i => ("hi", 900L + (i % 5)))
    val r = runOn(rows)
    check(r, replica(rows))
    assert(r.getBoolean(5), s"means 1.0 vs 9.0 with noise 0.05 must differ: $r")
  }

  test("a single group never claims a difference") {
    val r = runOn(Seq(("only", 1L), ("only", 2L), ("only", 3L)))
    assert(r.getLong(0) == 1L && r.isNullAt(4) && !r.getBoolean(5))
  }
}
