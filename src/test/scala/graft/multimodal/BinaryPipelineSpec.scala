package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import BinaryPipeline.{DecodedMeta, MediaRow}

class BinaryPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mediaRows = Tables.documents(spark, TestSpark.sf)
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("video")).as("media_type"))
    .as[MediaRow]

  test("partition-wise batched decode covers every row deterministically") {
    val out1 = BinaryPipeline.decodeMeta(mediaRows).collect().sortBy(_.doc_id)
    val out2 = BinaryPipeline.decodeMeta(mediaRows, batchSize = 7).collect().sortBy(_.doc_id)
    assert(out1.length == mediaRows.count())
    assert(out1.toSeq == out2.toSeq, "result must not depend on batch size")
    assert(out1.forall(_.ok))
    assert(out1.forall(m => m.width >= 32 && m.height >= 32 && m.byte_len > 0))
  }

  test("empty payloads are flagged, not dropped") {
    val rows = Seq(MediaRow(1L, Array.emptyByteArray, "image"),
      MediaRow(2L, "abc".getBytes, "video")).toDS()
    val out = BinaryPipeline.decodeMeta(rows).collect().sortBy(_.doc_id)
    assert(out.length == 2)
    assert(!out(0).ok && out(0).byte_len == 0)
    assert(out(1).ok && out(1).n_frames >= 1)
  }

  test("custom expressions are callable from plain SQL once registered") {
    // GraftExtensions wires the same builders through SparkSessionExtensions
    // at session build time; a default session already exists in this JVM,
    // so exercise the extensions object directly plus the SQL path.
    new graft.functions.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    graft.geo.GeoFunctions.register(spark)
    graft.functions.HashExprs.register(spark)
    val d = spark.sql("SELECT haversine_m(40.0, -74.0, 41.0, -74.0) AS d")
      .collect().head.getDouble(0)
    assert(math.abs(d - 111229) < 200)
    val pip = spark.sql(
      "SELECT point_in_polygon(0.5, 0.5, array(1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0)) AS c")
      .collect().head.getBoolean(0)
    assert(pip)
    val sig = spark.sql("SELECT minhash_sig(array('a b c', 'b c d')) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 64)
  }
}
