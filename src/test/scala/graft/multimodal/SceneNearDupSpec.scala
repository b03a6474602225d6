package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `mm_scene_neardup` contract: re-cut footage with a replaced intro pairs
  * scene-to-scene — the segment identity `mm_frame_overlap`'s whole-video
  * digest count cannot express — and the verdict is the exact integer
  * 2·shared ≥ min(nₐ, n_b) compare. */
class SceneNearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("re-cut video with a replaced intro pairs on its shared scene") {
    // videos are doc_id % 3 == 2; ids 2 and 77 share n_frames = 8 + id%25
    // = 10, so sampled frames sit at idx 0, 4, 8 over equal-length
    // payloads. Both are 100 chars: doc 2 opens with 'a'*40 (letter class
    // a-g), doc 77 with 'v'*40 (class v-z) — the replaced intro — and both
    // share 'o'*60 (class o-u). Frame 0 falls in the intro, frames 4 and 8
    // in the shared footage; the class flip forces a scene boundary at
    // frame 4 in both videos, so each has 2 scenes and the second scene's
    // digest chain is identical.
    val d = java.nio.file.Files.createTempDirectory("scene_nd").toString
    writeDocs(d, Seq(
      2L -> ("a" * 40 + "o" * 60),
      77L -> ("v" * 40 + "o" * 60),
      // decoy video with entirely different content — must pair with nobody
      5L -> ("b" * 30 + "c" * 40 + "d" * 29)))
    val got = MultimodalQueries.sceneNearDup(spark, d).collect()
    graft.CacheRegistry.releaseAll()
    assert(got.length == 1, s"exactly the re-cut pair must emerge: ${got.toSeq}")
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == (2L, 77L))
    assert(r.getLong(2) == 1L, "the shared-footage scene pairs")
    assert((r.getLong(3), r.getLong(4)) == (2L, 2L), "intro scene + footage scene each")
    assert(r.getDouble(5) == 0.3333, "jaccard = 1/(2+2-1)")
    assert(r.getBoolean(6), "2*1 >= min(2,2): near-dup verdict fires")
  }

  test("frame-level overlap dilutes what the scene report pinpoints") {
    // same fixture: mm_frame_overlap sees 2 shared frame digests out of 3
    // per video — a bare count with no segment identity; the scene report
    // names ONE fully-matching scene out of two per side.
    val d = java.nio.file.Files.createTempDirectory("scene_nd2").toString
    writeDocs(d, Seq(2L -> ("a" * 40 + "o" * 60), 77L -> ("v" * 40 + "o" * 60)))
    val fo = MultimodalQueries.frameOverlap(spark, d).collect()
    graft.CacheRegistry.releaseAll()
    // frames 4 and 8 both read 'o'*10 → ONE distinct shared digest
    assert(fo.length == 1 && fo.head.getLong(2) == 1L,
      "precondition: frame overlap reports a bare digest count")
    val sn = MultimodalQueries.sceneNearDup(spark, d).collect()
    graft.CacheRegistry.releaseAll()
    assert(sn.length == 1 && sn.head.getLong(2) == 1L && sn.head.getBoolean(6),
      "scene report: the matching SEGMENT is identified and the verdict fires")
  }
}
