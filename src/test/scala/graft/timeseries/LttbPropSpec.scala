package graft.timeseries

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Generative check of `ts_lttb`: on random series the distributed
  * integer-geometry argmax must equal a brute driver replay of the same
  * declared metric computed in exact BigInt arithmetic — the bug classes
  * this targets are decimal-overflow truncation in the cross product and
  * endpoint/tie mis-selection. Fixed-seed generator loop (the
  * scalatest-scalacheck bridge is not on the offline classpath). */
class LttbPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // value in cents (2 decimals, like the corpus); ts strictly increasing
  private val stepGen = for {
    dtSec <- Gen.chooseNum(1L, 90000L)
    cents <- Gen.chooseNum(0L, 56021L)
  } yield (dtSec, cents)

  private def series(seed: Long, n: Int): Seq[(Long, Long, Long)] = {
    var t = 1700000000L
    (0 until n).map { i =>
      val (dt, c) = LazyList.from(0).flatMap(j =>
        stepGen.apply(Gen.Parameters.default,
          org.scalacheck.rng.Seed(seed + i * 31 + j))).head
      t += dt
      (i.toLong, t, c)
    }
  }

  /** Brute replay of the declared metric in BigInt (no overflow bound). */
  private def brute(pts: Seq[(Long, Long, Long)], buckets: Long): Seq[Long] = {
    val n = pts.length.toLong
    val x0 = pts.map(_._2).min
    val byB = pts.groupBy { case (id, _, _) => id * buckets / n }
    val ids = byB.keys.toSeq.sorted
    case class A(c: BigInt, sx: BigInt, sy: BigInt)
    val agg = byB.map { case (b, v) =>
      b -> A(v.size, v.map(p => BigInt(p._2 - x0)).sum, v.map(p => BigInt(p._3)).sum)
    }
    // neighbors are POSITIONAL in the bucket ledger (lag/lead order), not
    // b±1 arithmetic — they differ when n < Buckets leaves id gaps
    ids.zipWithIndex.map { case (b, idx) =>
      val prev = if (idx > 0) Some(agg(ids(idx - 1))) else None
      val next = if (idx < ids.length - 1) Some(agg(ids(idx + 1))) else None
      val members = byB(b)
      (prev, next) match {
        case (Some(p), Some(nx)) =>
          members.map { case (id, xs, y) =>
            val x = BigInt(xs - x0); val yc = BigInt(y)
            val num = (p.sx * nx.c - nx.sx * p.c) * (yc * p.c - p.sy) -
              (p.sx - x * p.c) * (nx.sy * p.c - p.sy * nx.c)
            (-num.abs, id)
          }.min._2
        case (Some(_), None) => members.map(_._1).max // last bucket: last point
        case _ => members.map(_._1).min               // first/only: first point
      }
    }
  }

  test("random series: distributed picks equal the exact BigInt replay") {
    for (seed <- 1L to 6L) {
      // spans both regimes: n < Buckets (singleton buckets, id gaps) and
      // n > Buckets (multi-member buckets exercising the argmax)
      val n = if (seed % 2 == 0) 40 + (seed * 37 % 160).toInt
        else 600 + (seed * 137 % 900).toInt
      val pts = series(seed * 1000, n)
      val d = java.nio.file.Files.createTempDirectory(s"lttbp$seed").toString
      pts.map { case (id, ts, c) =>
        (id, new java.sql.Timestamp(ts * 1000L), id % 7, c.toDouble / 100.0, "view", "{}")
      }.toDF("event_id", "ts", "user_id", "value", "event_type", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      val got = SparkEntry.queries("ts_lttb")(spark, d).collect()
        .map(r => r.getLong(1) -> r.getLong(0)).sortBy(_._1).map(_._2).toSeq
      val expect = brute(pts, Lttb.Buckets)
      assert(got == expect, s"seed $seed n=$n")
    }
  }
}
