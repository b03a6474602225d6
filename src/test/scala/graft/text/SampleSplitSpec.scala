package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `sample_split`: exact-partition property, content-keyed duplicate
  * co-location (the leakage contract), frozen assignments under corpus
  * growth, and share calibration at corpus scale. */
class SampleSplitSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("every document lands in exactly one split and shares track 90/5/5") {
    val rows = SampleSplit.split(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length == total, "assignment must be exhaustive")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per doc")
    val shares = rows.groupBy(_.getString(2)).view.mapValues(_.length.toDouble / total).toMap
    assert(shares.keySet.subsetOf(Set("train", "val", "test")))
    assert(shares("train") > 0.85 && shares("train") < 0.95, s"train share: $shares")
    assert(shares.getOrElse("val", 0.0) < 0.10 && shares.getOrElse("test", 0.0) < 0.10,
      s"holdout shares: $shares")
  }

  test("byte-identical documents always co-locate in the same split") {
    // plant duplicate texts under distinct doc_ids across the id space
    val dir = java.nio.file.Files.createTempDirectory("graft_split_dup").toString
    spark.range(300)
      .selectExpr("id AS doc_id", "concat('shared text nr ', id % 40) AS text",
        "'en' AS lang", "'web' AS source", "10L AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SampleSplit.split(spark, dir).collect()
    val byText = rows.groupBy(_.getLong(0) % 40)
    byText.foreach { case (k, grp) =>
      assert(grp.map(_.getString(2)).distinct.length == 1,
        s"duplicate group $k straddles splits: ${grp.map(_.getString(2)).toSet}")
    }
  }

  test("appending new documents never reassigns an old one") {
    val docs = graft.Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_split_half").toString
    val half = docs.count() / 2
    docs.filter(s"doc_id < $half").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val before = SampleSplit.split(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val after = SampleSplit.split(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    before.foreach { case (id, sp) =>
      assert(after(id) == sp, s"doc $id reassigned $sp -> ${after(id)}")
    }
  }
}
