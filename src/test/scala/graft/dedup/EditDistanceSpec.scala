package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `dedup_edit_distance` contract: planted localized-edit pairs are found
  * with the exact Levenshtein cost, the two declared bounds (absolute +
  * relative) both cut, the distance is code-point (not byte) Levenshtein,
  * and the corpus run replays driver-side. */
class EditDistanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def runOn(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, Double)] = {
    val d = java.nio.file.Files.createTempDirectory("editdist").toString
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = DedupQueries.editDistance(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    graft.CacheRegistry.releaseAll()
    out
  }

  private val base = (1 to 80).map(i => s"word${(i * 13) % 41}n$i").mkString(" ")

  test("planted localized edits pair with the exact cost; heavy rewrites are cut by the ratio") {
    val ws = base.split(" ")
    val oneSub = ws.updated(40, "wordXXn41").mkString(" ")      // few-char substitution
    val oneIns = (ws.take(20) :+ "EXTRA").concat(ws.drop(20)).mkString(" ")
    // shares the whole first half (still a banded candidate) but the tail
    // is rewritten wholesale: edit cost blows past the 0.2 ratio even
    // though half the shingles agree
    val heavy = (ws.take(40) ++ (41 to 80).map(i => s"zzqx${i}vv")).mkString(" ")
    val out = runOn(Seq(0L -> base, 1L -> oneSub, 2L -> oneIns, 3L -> heavy))
    val pairs = out.map { case (a, b, _, _) => (a, b) }.toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      s"scrambled doc must fail the ratio cut: $out")
    // exact costs: "word0n41" -> "wordXXn41" is one substitution plus one
    // insertion (2); one inserted word costs its 5 chars plus the separator
    assert(out.collect { case (0L, 1L, d, _) => d } == Seq(2L))
    assert(out.collect { case (0L, 2L, d, _) => d } == Seq(6L))
  }

  test("the absolute MaxAbsEdit bound cuts even when the ratio would keep") {
    // same length (same lb block, still banded candidates: most shingles
    // shared), a contiguous 260-char span substituted: ratio ≈ 260/2800 <
    // 0.2 would KEEP the pair, but 260 edits > MaxAbsEdit=256 cuts it
    val long = (1 to 400).map(i => s"tk${(i * 7) % 53}v$i").mkString(" ")
    assert(long.length > 2000)
    val edited = long.take(1000) + ("Z" * 260) + long.drop(1260)
    assert(edited.length == long.length)
    val out = runOn(Seq(0L -> long, 1L -> edited))
    assert(!out.exists { case (a, b, _, _) => (a, b) == (0L, 1L) },
      s"260 edits must exceed the declared absolute bound: $out")
  }

  test("distance is code-point Levenshtein (multi-byte chars count once)") {
    // identical except one accented char: code-point cost 1, byte cost 2.
    // (The oracle's byte-based DuckDB would disagree here — which is why
    // the divergence is DECLARED and the gate corpora are ASCII.)
    val a = base + " café corner"
    val b = base + " cafe corner"
    val out = runOn(Seq(0L -> a, 1L -> b))
    assert(out.collect { case (0L, 1L, d, _) => d } == Seq(1L))
  }

  test("corpus run equals a driver replay of banded candidates + bounded Levenshtein") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cands = DedupQueries.bandedCandidates(spark, TestSpark.sf,
        DedupQueries.EditMinBandMatches)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.CacheRegistry.releaseAll()
    def lev(x: String, y: String): Int = {
      val (n, m) = (x.length, y.length)
      val dp = Array.tabulate(m + 1)(identity)
      for (i <- 1 to n) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to m) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(m)
    }
    val expect = cands.flatMap { case (a, b) =>
      val (ta, tb) = (docs(a), docs(b))
      val mx = math.max(ta.length, tb.length)
      val d = lev(ta, tb)
      if (d <= DedupQueries.MaxAbsEdit && d <= DedupQueries.MaxEditRatio * mx)
        Some((a, b, d.toLong,
          if (mx == 0) 0.0 else math.rint(d.toDouble / mx * 10000) / 10000))
      else None
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = SparkEntry.queries("dedup_edit_distance")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    graft.CacheRegistry.releaseAll()
    assert(got == expect)
  }
}
