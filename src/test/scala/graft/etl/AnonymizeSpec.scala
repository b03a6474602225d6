package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class AnonymizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val source: Seq[(Long, String, java.time.LocalDate, Long)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), to_date(col("ts")).as("day"),
        expr(s"user_id div ${Anonymize.CohortWidth}").as("cohort"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate, r.getLong(3)))
      .toSeq

  private lazy val got: Map[Long, (String, java.time.LocalDate, Option[Long], String)] =
    Anonymize.kAnonymize(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDate(2).toLocalDate,
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getString(4))).toMap

  test("distributed ladder equals the driver-side replay") {
    val g0 = source.groupBy(t => (t._2, t._3, t._4)).view.mapValues(_.size).toMap
    val needCoarse = source.filter(t => g0((t._2, t._3, t._4)) < Anonymize.K)
    val g1 = needCoarse.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val expect = source.flatMap { case (id, tpe, day, cohort) =>
      if (g0((tpe, day, cohort)) >= Anonymize.K)
        Some(id -> (tpe, day, Some(cohort), "full"))
      else if (g1((tpe, day)) >= Anonymize.K)
        Some(id -> (tpe, day, None, "coarse"))
      else None
    }.toMap
    assert(got == expect)
  }

  test("the release is k-anonymous on its published quasi-identifiers") {
    // full rows: exact-QI equivalence classes all ≥ K
    val fullGroups = got.values.filter(_._4 == "full")
      .groupBy(v => (v._1, v._2, v._3)).values.map(_.size)
    assert(fullGroups.nonEmpty && fullGroups.forall(_ >= Anonymize.K))
    // coarse rows: (type, day) classes all ≥ K, cohort always generalized
    val coarse = got.values.filter(_._4 == "coarse")
    assert(coarse.forall(_._3.isEmpty))
    val coarseGroups = coarse.groupBy(v => (v._1, v._2)).values.map(_.size)
    assert(coarseGroups.forall(_ >= Anonymize.K))
    // the ladder must actually exercise all three outcomes on the corpus
    assert(coarse.nonEmpty, "no coarse rows: QI too coarse to test the ladder")
    assert(got.size < source.size, "nothing suppressed: ladder untested")
  }

  test("l-diversity audit equals a driver-side replay and catches homogeneity") {
    import org.apache.spark.sql.functions.{col, expr, to_date}
    val rows = graft.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string").as("day"),
        expr(s"user_id div ${Anonymize.CohortWidth}").as("cohort"), col("event_type"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getString(2))).toSeq
    val expect = rows.groupBy(_._1).map { case (qi, vs) =>
      qi -> (vs.size.toLong, vs.map(_._2).distinct.size.toLong)
    }
    val got = Anonymize.lDiversity(spark, sf).collect().map(r =>
      ((r.getDate(0).toString, r.getLong(1)), (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (qi, (n, nd, released)) =>
      val (en, end) = expect(qi)
      assert(n == en && nd == end, s"group $qi counts")
      assert(released == (n >= Anonymize.K && nd >= Anonymize.DivL), s"group $qi gate")
    }
    // the gate must catch at least one k-anonymous-but-homogeneous group —
    // the attack l-diversity exists for
    assert(got.values.exists { case (n, nd, rel) =>
      n >= Anonymize.K && nd < Anonymize.DivL && !rel
    }, "no homogeneous group blocked on the test corpus")
    assert(got.values.exists(_._3), "nothing released")
  }

  test("gdpr deletion audit equals a driver-side replay and conserves rows") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val rows = graft.Tables.events(spark, sf)
      .select(date_trunc("month", col("ts")).cast("date").cast("string").as("m"),
        col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Anonymize.gdprDeleteAudit(spark, sf).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val byMonth = rows.groupBy(_._1)
    assert(got.keySet == byMonth.keySet)
    byMonth.foreach { case (m, vs) =>
      val del = vs.filter(_._2 % Anonymize.ErasureCohortMod == Anonymize.ErasureCohortRem)
      val (ne, nr, nu) = got(m)
      assert(ne == del.size.toLong && nr == (vs.size - del.size).toLong, s"month $m counts")
      assert(nu == del.map(_._2).distinct.size.toLong, s"month $m users")
      assert(ne + nr == vs.size.toLong, "row conservation")
    }
    assert(got.values.exists(_._1 > 0), "erasure cohort empty on the corpus")
  }

  test("pseudonymization is stable, injective, and format-bounded") {
    import org.apache.spark.sql.functions.col
    val src = graft.Tables.events(spark, sf).select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Anonymize.pseudonymize(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == src.keySet)
    // same user => same token; distinct users => distinct tokens
    val byUser = got.toSeq.groupBy(p => src(p._1)).view.mapValues(_.map(_._2).distinct).toMap
    assert(byUser.values.forall(_.size == 1), "a user mapped to two tokens")
    val tokens = byUser.values.map(_.head).toSeq
    assert(tokens.distinct.size == tokens.size, "token collision across users")
    assert(tokens.forall(t => t.length == 16 && t.forall(c => c.isDigit || ('a' to 'f').contains(c))))
    // raw ids never appear in the released columns
    assert(Anonymize.pseudonymize(spark, sf).columns.toSet ==
      Set("event_id", "user_pseudo", "event_type", "day"))
  }
}
