package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `emb_drift` contract: conservation of both splits, consistency with the
  * shared frozen-model assignment path (`emb_incremental_assign`), and a
  * planted distribution shift that must flag. */
class DriftSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val rows: Seq[(Long, Long, Long, Double, Double, Option[Double], Boolean)] =
    Kmeans.drift(spark, sf).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getBoolean(6)))

  test("split conservation: per-cluster counts sum to the split sizes") {
    import org.apache.spark.sql.functions._
    val all = graft.Tables.embeddings(spark, sf)
    val maxId = all.agg(max(col("vec_id"))).head.getLong(0)
    val split = graft.dedup.IncrementalNearDup.splitId(maxId)
    val nHist = all.filter(col("vec_id") < split).count()
    val nNew = all.filter(col("vec_id") >= split).count()
    assert(rows.map(_._2).sum == nHist && rows.map(_._3).sum == nNew)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 0.01, "history shares sum to 1")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 0.01, "new shares sum to 1")
  }

  test("new-batch counts agree with the incremental-assign path") {
    val viaAssign = Kmeans.incrementalAssign(spark, sf).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (c, _, nNew, _, _, _, _) =>
      assert(viaAssign.getOrElse(c, 0L) == nNew, s"cluster $c new count")
    }
    assert(viaAssign.keySet == rows.filter(_._3 > 0).map(_._1).toSet)
  }

  test("chi2 flags honor the threshold and dead-cell rule") {
    rows.foreach { case (c, nHist, nNew, _, _, chi2, drifted) =>
      if (nHist == 0) assert(chi2.isEmpty, s"cluster $c: chi2 on dead cell")
      val expect = (nHist == 0 && nNew > 0) || chi2.exists(_ >= Kmeans.DriftChi2)
      assert(drifted == expect, s"cluster $c flag")
    }
  }

  test("a planted batch shift flags the over-represented cluster") {
    // history: 8 axis-2 vectors (ids % 5 == 0) + 32 axis-1; the new batch
    // (ids 40..49) is ALL axis-2 — a 5x over-representation of a 20% cluster
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    spark.range(50)
      .selectExpr("id AS vec_id",
        """transform(sequence(1, 64), j -> CAST(
          |  CASE WHEN j = (CASE WHEN id % 5 = 0 OR id >= 40 THEN 2 ELSE 1 END)
          |  THEN 1.0 ELSE 0.0 END AS FLOAT)) AS embedding""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val planted = Kmeans.drift(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(6)))
    // the axis-2 cluster: 8 of 40 history (20%), all 10 new rows (100%)
    val hot = planted.filter(p => p._5 > p._4)
    assert(hot.nonEmpty, s"no over-represented cluster in ${planted.toSeq}")
    assert(hot.forall(_._6), s"over-represented cluster not flagged: ${hot.toSeq}")
    assert(hot.map(_._3).sum == 10L, "all new rows land in the hot cluster")
  }
}
