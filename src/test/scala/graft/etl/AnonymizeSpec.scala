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
}
