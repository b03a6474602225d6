package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `mm_scene_detect`: driver-side replay of the integer histogram distance
  * and a planted alphabet-switching video that must cut exactly once. */
class SceneDetectSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def hist(t: String): Array[Long] = Array(
    t.count(c => c >= 'a' && c <= 'g').toLong,
    t.count(c => c >= 'h' && c <= 'n').toLong,
    t.count(c => c >= 'o' && c <= 'u').toLong,
    t.count(c => c >= 'v' && c <= 'z').toLong)

  test("distances and boundaries equal a driver-side replay") {
    val docs = graft.Tables.documents(spark, sf)
      .filter("doc_id % 3 = 2").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = MultimodalQueries.sceneDetect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))).toMap
    var checked = 0
    docs.foreach { case (id, text) =>
      val chars = text.length.toLong
      val nf = 8 + id % 25
      val frames = (0L until nf by MultimodalQueries.Stride).map { i =>
        val start = (i * chars) / nf          // 0-based slice bounds
        val end = ((i + 1) * chars) / nf      // exclusive
        i -> hist(text.substring(start.toInt, math.max(start.toInt, end.toInt)))
      }
      frames.sliding(2).foreach {
        case Seq((_, _), _) if frames.length < 2 =>
        case Seq((ia, ha), (ib, hb)) =>
          val d = (0 until 4).map(j => math.abs(ha(j) - hb(j))).sum
          val den = ha.sum + hb.sum
          val exp = (Some(d), 4 * d > den)
          assert(got((id, ib)) == exp, s"doc $id frame $ib: ${got((id, ib))} vs $exp")
          checked += 1
        case _ =>
      }
      assert(got((id, frames.head._1)) == ((None, false)), s"doc $id first frame")
    }
    assert(checked > 100, s"replay barely exercised: $checked pairs")
  }

  test("an alphabet-switching video cuts exactly at the switch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scene").toString
    // doc_id 2 (% 3 == 2 -> video), n_frames = 8 + 2 = 10, stride 4 ->
    // frames 0, 4, 8. First half 'abab', second half 'zyzy': the 4->8
    // transition crosses the midpoint switch, 0->4 does not.
    val half1 = "abcdefg" * 40
    val half2 = "vwxyz" * 56
    import spark.implicits._
    Seq((2L, half1 + half2, "en", "web", (half1 + half2).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = MultimodalQueries.sceneDetect(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(rows.keySet == Set(0L, 4L, 8L))
    assert(!rows(4L), "frame 4 is inside the first alphabet: no cut")
    assert(rows(8L), "frame 8 crosses the switch: must cut")
  }
}
