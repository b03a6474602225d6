package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `mm_keyframe_select` contract: the greedy trajectory replays against a
  * driver farthest-point replica fed by the REGISTERED `mm_frame_sample`
  * digests (composition); a planted digest pattern pins seed choice, the
  * max-min pick, and the lowest-index tie-break; short videos select all
  * frames. */
class KeyframesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  /** Driver greedy replica under the declared rule. */
  private def replica(frames: Seq[(Long, Long, Long)], k: Int)
    : Map[Long, Seq[(Long, Long, Option[Long])]] = {
    frames.groupBy(_._1).map { case (doc, fs0) =>
      val fs = fs0.map(f => (f._2, f._3)).sortBy(_._1)
      var sel = Vector((fs.head._1, fs.head._2, Option.empty[Long]))
      for (t <- 1 until k) {
        val cands = fs.filterNot(f => sel.exists(_._1 == f._1))
        if (cands.nonEmpty) {
          val scored = cands.map { case (idx, h) =>
            (idx, h, sel.map(s => java.lang.Long.bitCount(h ^ s._2).toLong).min)
          }
          val pick = scored.minBy { case (idx, _, d) => (-d, idx) }
          sel :+= ((pick._1, pick._2, Some(pick._3)))
        }
      }
      doc -> sel.map(s => (s._1, s._2, s._3))
    }
  }

  test("greedy trajectory replays from the registered frame digests at sf0.001") {
    val frames = SparkEntry.queries("mm_frame_sample")(spark, sf).collect()
      .map { r =>
        val h = java.lang.Long.parseLong(r.getString(5).take(15), 16)
        (r.getLong(0), r.getLong(1), h)
      }.toSeq
    graft.CacheRegistry.releaseAll()
    val expect = replica(frames, Keyframes.K)
    val got = SparkEntry.queries("mm_keyframe_select")(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(got.nonEmpty)
    expect.foreach { case (doc, sel) =>
      val rows = got(doc).sortBy(_.getLong(1))
      assert(rows.length == sel.length, s"video $doc: ${rows.length} != ${sel.length}")
      rows.zip(sel).foreach { case (r, (idx, _, d)) =>
        assert(r.getLong(2) == idx, s"video $doc round ${r.getLong(1)}: " +
          s"picked ${r.getLong(2)}, replica $idx")
        d match {
          case Some(v) => assert(r.getLong(3) == v)
          case None => assert(r.isNullAt(3))
        }
      }
    }
    graft.CacheRegistry.releaseAll()
  }

  private def runOn(frames: Seq[(Long, Long, Long)]) = {
    val rows = Keyframes.keyframesOf(frames.toDF("doc_id", "frame_idx", "h")).collect()
    graft.CacheRegistry.releaseAll()
    rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
  }

  test("planted digests pin seed, max-min pick, and the lowest-index tie-break") {
    // video 9: h = {0: 0b0000, 1: 0b1111, 2: 0b0001, 3: 0b1110}
    // seed = idx 0. Round 1: dists to {0} are 4/1/3 → idx 1 (dist 4).
    // Round 2: min-dists to {0,1}: idx2 = min(1,3) = 1; idx3 = min(3,1) = 1
    //  → tie at 1 → lowest frame_idx wins → idx 2.
    val got = runOn(Seq((9L, 0L, 0L), (9L, 1L, 15L), (9L, 2L, 1L), (9L, 3L, 14L)))
    assert(got((9L, 0L)) == ((0L, -1L)))
    assert(got((9L, 1L)) == ((1L, 4L)))
    assert(got((9L, 2L)) == ((2L, 1L)), s"tie must break to the lowest frame_idx: $got")
  }

  test("a video with fewer frames than K selects them all and stops") {
    val got = runOn(Seq((5L, 2L, 7L), (5L, 6L, 8L)))
    assert(got.size == 2)
    assert(got((5L, 0L))._1 == 2L && got((5L, 1L))._1 == 6L)
  }
}
