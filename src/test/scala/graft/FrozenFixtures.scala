package graft

import org.apache.spark.sql.SparkSession

/** The FROZEN canary fixture shared by `FrozenDigestSpec` and
  * `RowsOnlyCanarySpec`: a 20-doc corpus with known edit structure
  * (unchanged from the original FrozenDigestSpec corpus — its checked-in
  * digest tables depend on it), plus deterministic events and embeddings
  * tables so every rows-only operator has a frozen input. All three tables
  * are pure integer-formula constructions: no RNG, no clock, no
  * environment — identical bytes-in on every run forever. */
object FrozenFixtures {

  /** A base doc and four small edits (insert / replace / truncate /
    * duplicate), two exact twins, three unrelated docs, and ten template
    * docs sharing a boilerplate prefix with unique tails. */
  def docs: Seq[(Long, String)] = {
    val base = (1 to 60).map(i => s"tok${(i * 7) % 23}n$i").mkString(" ")
    val ws = base.split(" ")
    val inserted = (ws.take(30) :+ "INSERTED").concat(ws.drop(30)).mkString(" ")
    val replaced = ws.updated(45, "REPLACED").mkString(" ")
    val truncated = ws.take(48).mkString(" ")
    val header = "site header navigation terms privacy contact about careers press"
    Seq(
      0L -> base,
      1L -> inserted,
      2L -> replaced,
      3L -> truncated,
      4L -> base,                       // exact twin of 0
      5L -> "completely different content about catalyst optimizer rules and physical planning",
      6L -> "another unrelated passage mentioning shuffle exchanges and broadcast thresholds today",
      7L -> "third standalone text with no overlap in vocabulary whatsoever here now",
      8L -> (header + " unique tail eight alpha beta gamma delta epsilon zeta eta theta"),
      9L -> (header + " unique tail nine iota kappa lambda mu nu xi omicron pi")
    ) ++ (10L until 20L).map(i =>
      i -> (header + s" body $i " + (1 to 20).map(j => s"w${(i * 31 + j * 17) % 97}u$j").mkString(" ")))
  }

  /** 300 events over 12 users, 4 types, 400-minute span — ts stored as raw
    * LONG nanos (the TIMESTAMP(NANOS) shipping shape `Tables.events`
    * normalizes). */
  private def eventRows: Seq[(Long, Long, Long, String, Double, String)] = {
    val types = Seq("click", "view", "signup", "error")
    val baseNs = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z
    (0L until 300L).map { i =>
      val ts = baseNs + i * 80L * 1000000000L
      val user = (i * 7L + i / 31L) % 12L
      val tp = types(((i * 13L + 5L) % 4L).toInt)
      val value = ((i * 37L + 11L) % 997L).toDouble / 4.0
      (i, ts, user, tp, value, s"""{"k": ${i % 90}}""")
    }
  }

  /** 40 × 64-dim float vectors from an exact rational formula. */
  private def embRows: Seq[(Long, Array[Float], Int)] =
    (0L until 40L).map { i =>
      val v = Array.tabulate(64) { j =>
        (((i * 31L + j * 17L + 13L) % 97L) - 48L).toFloat / 97.0f
      }
      (i, v, (i % 5L).toInt)
    }

  /** Write all three frozen tables into `dir` (single part files so the
    * layout is as frozen as the content). */
  def writeAll(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    eventRows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    embRows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  @volatile private var cached: String = null

  /** The shared frozen dir, written once per JVM. */
  def dir(spark: SparkSession): String = synchronized {
    if (cached == null) {
      val d = java.nio.file.Files.createTempDirectory("frozen_fixture").toString
      writeAll(spark, d)
      cached = d
    }
    cached
  }
}
