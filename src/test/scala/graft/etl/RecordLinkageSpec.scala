package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `etl_record_linkage`: ground-truth evaluation — the match decision
  * never reads event_id, so identity measures linkage quality: precision
  * of `match` against the known twin, recall over linkable truth, and the
  * review-band semantics for the upstream's ~111 m re-geocodes. */
class RecordLinkageSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val rows: Seq[(Long, Long, Boolean, Boolean, Long, String)] =
    RecordLinkage.linkage(spark, sf).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(4), r.getBoolean(5),
        r.getLong(6), r.getString(7)))

  test("match precision against ground-truth identity is near-perfect") {
    val matches = rows.filter(_._6 == "match")
    assert(matches.nonEmpty)
    val truePos = matches.count(m => m._1 == m._2)
    assert(truePos.toDouble / matches.size >= 0.95,
      s"precision ${truePos.toDouble / matches.size} over ${matches.size} matches")
  }

  test("every linkable true pair is recovered as match or possible") {
    // linkable truth: the row is in carto, geocoded on BOTH sides — its
    // soda twin blocks within one cell by construction
    val ids = graft.Tables.events(spark, sf).select("event_id").collect().map(_.getLong(0))
    val linkable = ids.filter { id =>
      val inCarto = id % 10 != 3
      val cartoGeo = id % 19 != 0 && id % 97 != 0 && id % 101 != 0
      val sodaGeo = !(id % 19 == 0 && id % 2 == 1)
      inCarto && cartoGeo && sodaGeo
    }.toSet
    val found = rows.filter(r => r._1 == r._2).map(_._1).toSet
    val missing = linkable -- found
    assert(missing.isEmpty, s"${missing.size} linkable truth pairs lost: ${missing.take(5)}")
  }

  test("re-geocoded rows land in the clerical-review band, not match") {
    // id % 17 moves ~111 m: coords disagree, value still agrees
    val moved = rows.filter { case (a, b, _, _, _, _) =>
      a == b && a % 17 == 0 && a % 23 != 0
    }
    assert(moved.nonEmpty, "no moved twin pairs on the corpus")
    moved.foreach { case (a, _, coordA, valueA, score, verdict) =>
      assert(!coordA && valueA, s"row $a agreement vector")
      assert(verdict == "possible" && score == RecordLinkage.WCoordDisagree +
        RecordLinkage.WValueAgree, s"row $a: $verdict/$score")
    }
  }

  test("small upstream nudges (~5.5 m) still match exactly") {
    val nudged = rows.filter { case (a, b, _, _, _, _) =>
      a == b && a % 23 == 0 && a % 17 != 0
    }
    assert(nudged.nonEmpty)
    nudged.foreach { case (a, _, coordA, _, _, verdict) =>
      assert(coordA && verdict == "match", s"row $a lost to a 5.5 m nudge")
    }
  }
}
