package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Cross-run digest pinning for the two operators whose correctness story
  * is otherwise replay-only (`dedup_cdc_chunks`, `mm_phash_neardup` — no
  * tractable SQL oracle exists for the sequential gear recurrence or the
  * fingerprint loop): a FROZEN 20-doc corpus with known edit structure,
  * and the complete expected output checked in as literals. Any change to
  * the chunk boundary rule, the digesting, the fingerprint mix, or the
  * banding that alters ONE output row fails here — the regression canary a
  * self-replay spec (which would change in lockstep) cannot provide. */
class FrozenDigestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** The frozen 20-doc corpus now lives in [[graft.FrozenFixtures]]
    * (shared with `RowsOnlyCanarySpec`); the checked-in digest tables
    * below depend on its exact construction. */
  private lazy val dir: String = graft.FrozenFixtures.dir(spark)

  /** (chunk_digest, n_docs, n_occurrences, min_doc, max_doc) — captured
    * once from the shipped implementation and frozen. The md5 digests pin
    * the exact chunk TEXT (hence the exact gear boundaries); the doc
    * ranges pin which documents share each chunk. */
  private val expectedCdc = Seq(
    ("176d5c4f5e6390215ff5695f1823b286", 5L, 5L, 0L, 4L),
    ("35c68047e444612751db8d477e8b40f6", 12L, 12L, 8L, 19L),
    ("490c7fc55ea0c902c63c59b7875712a7", 3L, 3L, 0L, 4L),
    ("503baf06afc31bf066b7af6fb7192ea5", 5L, 5L, 0L, 4L),
    ("551beec5a5e176284cdae8165d8d3ce7", 5L, 5L, 0L, 4L),
    ("82a21db0cc0f808db0cfcc3fd0e641b4", 5L, 5L, 0L, 4L),
    ("8e616a53b0b4b827d01eff308ee28e3a", 5L, 5L, 0L, 4L),
    ("9ea2a281ae9b003e04e264e52f95d2d6", 4L, 4L, 0L, 4L),
    ("c309bc6a2b3de31b2f3dbb13e9f47e14", 4L, 4L, 0L, 4L),
    ("dc530a3eefdd4988d38fb82f19694f00", 4L, 4L, 0L, 4L))

  /** (a_id, b_id, hamming) — the perceptual-fingerprint pair table. */
  private val expectedPhash = Seq(
    (0L, 1L, 0L), (0L, 2L, 0L), (0L, 3L, 2L), (0L, 4L, 0L),
    (1L, 2L, 0L), (1L, 3L, 2L), (1L, 4L, 0L),
    (2L, 3L, 2L), (2L, 4L, 0L), (3L, 4L, 2L))

  test("dedup_cdc_chunks output on the frozen corpus matches the checked-in digest table exactly") {
    val rows = SparkEntry.queries("dedup_cdc_chunks")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    graft.CacheRegistry.releaseAll()
    assert(rows == expectedCdc)
    // and the structure is the intended one: the boilerplate-header chunk
    // is shared by all 12 template docs, the edit family shares its
    // unperturbed chunks, nothing unrelated collides
    assert(rows.count { case (_, _, _, lo, hi) => lo == 8L && hi == 19L } == 1)
    assert(rows.count { case (_, _, _, lo, hi) => lo == 0L && hi == 4L } == 9)
  }

  test("mm_phash_neardup output on the frozen corpus matches the checked-in pair table exactly") {
    val rows = SparkEntry.queries("mm_phash_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    graft.CacheRegistry.releaseAll()
    assert(rows == expectedPhash)
    // structure: the whole edit family (0-4) pairs within Hamming<=3, the
    // exact twins at distance 0; no unrelated or template doc pairs at all
    val family = rows.map { case (a, b, _) => (a, b) }.toSet
    assert(family == (for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)).toSet)
    assert(rows.collect { case (0L, 4L, h) => h } == Seq(0L), "exact twins at distance 0")
  }
}
