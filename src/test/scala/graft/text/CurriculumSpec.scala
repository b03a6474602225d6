package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `sample_curriculum` — fluent text trains before word salad (the
  * curriculum's reason to exist), value-quantile stages from the exact
  * integer difficulty, and an independent driver replica of thresholds,
  * stages, and shards. */
class CurriculumSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  private def shardOf(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(10)
    java.lang.Long.parseLong(hex, 16) % Curriculum.Shards
  }

  /** Threshold/stage replica over the collected (doc_id, diff) pairs. */
  private def stagesOf(diffs: Map[Long, Long]): Map[Long, Long] = {
    val n = diffs.size.toLong
    val hist = diffs.values.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val cum = hist.scanLeft((0L, 0L)) { case ((_, c), (v, k)) => (v, c + k) }.drop(1)
    val ts = (1 until Curriculum.Stages).map { k =>
      cum.find { case (_, c) => c * 4 >= k * n }.get._1
    }
    diffs.map { case (id, d) => id -> (1L + ts.count(d > _)) }
  }

  test("planted corpus: fluent repetition stages before word salad; a bigram-less doc is stage 1") {
    // fluent: one bigram repeated (low surprisal); salad: every bigram
    // unique (maximal surprisal under the corpus LM); plus a one-word doc
    val fluent = (0L to 3L).map(i => (i, ("ab cd " * 30).trim, "en", "s", 0L))
    val salad = (4L to 7L).map(i =>
      (i, (0 until 40).map(j => s"w${i}_$j").mkString(" "), "en", "s", 0L))
    val tiny = Seq((8L, "solo", "en", "s", 0L))
    val docs = (fluent ++ salad ++ tiny)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_curr").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("sample_curriculum")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    graft.CacheRegistry.releaseAll()
    val fluentStages = (0L to 3L).map(out(_)._2)
    val saladStages = (4L to 7L).map(out(_)._2)
    assert(fluentStages.max < saladStages.min,
      s"fluent must stage strictly before salad: $fluentStages vs $saladStages")
    assert(out(8L)._1 == 0L && out(8L)._2 == 1L, s"bigram-less doc: ${out(8L)}")
    // replica: same thresholds/stages from the emitted difficulties
    val rep = stagesOf(out.view.mapValues(_._1).toMap)
    out.foreach { case (id, (_, st, sh)) =>
      assert(st == rep(id), s"doc $id stage $st != replica ${rep(id)}")
      assert(sh == shardOf(id), s"doc $id shard")
    }
  }

  test("corpus: value-quantile stages are ordered and non-empty, every doc appears once, shards replay") {
    val rows = graft.SparkEntry.queries("sample_curriculum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.length == n.toInt && rows.map(_._1).distinct.length == rows.length)
    val byStage = rows.groupBy(_._3)
    assert(byStage.keySet == (1L to Curriculum.Stages).toSet, s"stages: ${byStage.keySet}")
    (1L until Curriculum.Stages).foreach { k =>
      assert(byStage(k).map(_._2).max <= byStage(k + 1).map(_._2).min,
        s"stage $k difficulties must not exceed stage ${k + 1}'s")
    }
    val rep = stagesOf(rows.map(r => r._1 -> r._2).toMap)
    rows.foreach { case (id, _, st, sh) =>
      assert(st == rep(id)); assert(sh == shardOf(id))
    }
  }
}
