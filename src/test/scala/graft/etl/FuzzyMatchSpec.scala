package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.FuzzyJoin

class FuzzyMatchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val resolved: Set[(String, (Option[String], Option[String], Option[Long]))] =
    FuzzyMatch.fuzzyCrosswalk(spark, TestSpark.sf).collect()
      .map(r => (r.getString(1), (Option(r.getString(2)), Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toSet
  private lazy val byRaw: Map[String, (Option[String], Option[String], Option[Long])] = {
    // every event with the same raw value must resolve identically
    assert(resolved.size == resolved.map(_._1).size, resolved)
    resolved.toMap
  }

  test("planted typos resolve to the intended alias at the right distance") {
    assert(byRaw("sedna") == (Some("sedan"), Some("car"), Some(2L)))
    assert(byRaw("bycicle") == (Some("bicycle"), Some("bike"), Some(2L)))
    assert(byRaw("scootr") == (Some("scooter"), Some("scooter"), Some(1L)))
    assert(byRaw("truk") == (Some("truck"), Some("truck"), Some(1L)))
    assert(byRaw("vann") == (Some("van"), Some("busvan"), Some(1L)))
    assert(byRaw("e-scoter") == (Some("e-scooter"), Some("scooter"), Some(1L)))
    assert(byRaw("mopd") == (Some("moped"), Some("motorcycle"), Some(1L)))
    assert(byRaw("bas") == (Some("bus"), Some("busvan"), Some(1L)))
    // exact hit matches itself at distance 0
    assert(byRaw("sedan") == (Some("sedan"), Some("car"), Some(0L)))
  }

  test("ties break to the lexicographically smallest alias") {
    // sbu is distance 2 from BOTH "bus" and "suv" — "bus" wins
    assert(byRaw("sbu") == (Some("bus"), Some("busvan"), Some(2L)))
  }

  test("values with nothing within the distance budget stay unmatched") {
    assert(byRaw("golfcart") == (None, None, None))
    assert(byRaw("tracktor") == (None, None, None))
    // the empty slot is filtered out of the stream entirely
    assert(!byRaw.contains(""))
  }

  test("deletion-neighborhood blocking equals brute force on the corpus vocabulary") {
    val raw = spark.createDataFrame(
      FuzzyMatch.RawVocab.filter(_.nonEmpty).map(Tuple1(_))).toDF("raw_vt")
    val dim = EtlQueries.crosswalkDim(spark)
    val w = Window.partitionBy(col("raw_vt")).orderBy(col("dist"), col("alias"))
    val brute = raw.crossJoin(dim.select(col("alias")))
      .withColumn("dist", levenshtein(col("raw_vt"), col("alias")).cast("long"))
      .filter(col("dist") <= FuzzyMatch.MaxDist)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("raw_vt", "alias", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val blocked = FuzzyJoin.bestMatch(raw, "raw_vt", dim, "alias", FuzzyMatch.MaxDist)
      .select("raw_vt", "alias", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(blocked == brute)
    assert(blocked.nonEmpty)
  }

  test("the plan has no cartesian product and no broadcast nested loop") {
    val p = FuzzyMatch.fuzzyCrosswalk(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
