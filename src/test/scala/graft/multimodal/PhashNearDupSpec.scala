package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the perceptual-hash contract: near-identical payloads pair within
  * the Hamming bound under every edit class (value change, insertion,
  * truncation), distinct payloads stay far apart, and the pigeonhole
  * banding finds exactly the Hamming-≤3 pairs a brute-force scan finds. */
class PhashNearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def hashes(payloads: Seq[(Long, String)]): Map[Long, Long] = {
    graft.functions.HashExprs.register(spark)
    payloads.toDF("id", "text")
      .select(col("id"), graft.functions.HashExprs.phash64(encode(col("text"), "UTF-8")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // varied content (no repetition), so a LOCAL edit touches only a few of
  // the ~3000 byte 4-gram windows — the edit model of a re-encoded image,
  // not a global find/replace
  private val base = (0 until 200).map(i => s"byte$i segment").mkString(" ")

  test("edit classes stay within the Hamming bound; distinct payloads do not") {
    val h = hashes(Seq(
      0L -> base,
      1L -> base.replace("byte100", "zzzz100"),             // one value edit
      2L -> (base.take(300) + "INSERTED" + base.drop(300)), // insertion (shifts bytes)
      3L -> base.take(base.length - 40),                    // truncation
      4L -> (0 until 200).map(i => s"other$i chunk").mkString(" ")))
    assert(ham(h(0L), h(1L)) <= PhashNearDup.MaxHamming, s"value edit: ${ham(h(0L), h(1L))}")
    assert(ham(h(0L), h(2L)) <= PhashNearDup.MaxHamming, s"insertion: ${ham(h(0L), h(2L))}")
    assert(ham(h(0L), h(3L)) <= PhashNearDup.MaxHamming, s"truncation: ${ham(h(0L), h(3L))}")
    assert(ham(h(0L), h(4L)) > 10, s"distinct payloads too close: ${ham(h(0L), h(4L))}")
  }

  test("degenerate payloads: empty and sub-window binaries hash to 0, no throw") {
    val h = hashes(Seq(0L -> "", 1L -> "ab", 2L -> "abc"))
    assert(h.values.forall(_ == 0L))
  }

  test("banded pairing on the test corpus = brute-force Hamming pairs") {
    val got = PhashNearDup.phashPairs(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over all hashes (test corpus is small)
    graft.functions.HashExprs.register(spark)
    val all = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), graft.functions.HashExprs.phash64(encode(col("text"), "UTF-8")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      d = ham(ha, hb) if d <= PhashNearDup.MaxHamming
    } yield (a, b, d.toLong)).toSet
    assert(got == expected, s"banding missed=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty, "test corpus must contain perceptual near-dups")
  }
}
