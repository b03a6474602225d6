package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Frame-overlap near-dup contract: videos sharing identical sampled-frame
  * content pair with the full shared count; internally-repeated frames
  * cannot inflate a pair; sub-threshold overlap stays out. */
class FrameOverlapSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("same-footage videos pair with the full shared-frame count") {
    // doc ids 2 and 77: both % 3 == 2 (videos) and both % 25 == 2, so the
    // frame geometry (n_frames = 10, stride 4 → frames 0/4/8) is identical;
    // same text ⇒ all 3 sampled digests shared. Doc 5 is different footage.
    val footage = (0 until 120).map(i => s"scene$i cut").mkString(" ")
    val other = (0 until 120).map(i => s"reel$i cut").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_frames").toString
    Seq((2L, footage), (77L, footage), (5L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MultimodalQueries.frameOverlap(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 77L, 3L)), s"got ${got.toSeq}")
  }

  test("pair counts agree with distinct mm_frame_sample digests on the corpus") {
    val frames = MultimodalQueries.frameSample(spark, TestSpark.sf)
      .select("doc_id", "frame_digest").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val byDigest = frames.groupBy(_._2).values.map(_.map(_._1).sorted.toSeq)
    val expected = byDigest.toSeq.flatMap(ids =>
        for { a <- ids; b <- ids if a < b } yield (a, b))
      .groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
      .filter(_._3 >= MultimodalQueries.MinSharedFrames).toSet
    val got = MultimodalQueries.frameOverlap(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }
}
