package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wide-time-range hardening: every operator must run cleanly on a corpus
  * spanning 2015–2050 — the overflow/epoch-arithmetic class the one-month
  * driver corpus can never expose (the `Survivorship.orderKey` 2^20
  * packing survived five rounds green before a wide feed tripped ANSI
  * long-overflow; this spec makes the whole surface face that axis).
  * Values stay modest so declared numeric-range contracts (`stats_corr`'s
  * fixed-point declaration) are respected: TIME is the stressed axis,
  * including events BEFORE the 2024 order-key epoch (negative packed
  * keys must still order totally). */
class WideRangeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val wideDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wide").toString
    // dims/docs/embeddings from the small fixture — only events carries time
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("documents", "embeddings", "region", "nation", "customer",
      "supplier", "part", "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"${TestSpark.sf}/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // 4000 events over 35 years (2015-01-01 .. ~2049), ~3.2-day steps,
    // all five types, modest values, valid JSON payloads
    spark.sql(
      """SELECT id AS event_id,
        | (1420070400 + id * 276048) * 1000000000 AS ts,
        | id % 500 AS user_id,
        | element_at(array('view','click','purchase','error','signup'),
        |   int(id % 5) + 1) AS event_type,
        | CAST(50 + (id % 9000) AS DOUBLE) / 10.0 AS value,
        | concat('{"k": ', id % 100, '}') AS props
        |FROM range(4000)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs cleanly on the 35-year corpus") {
      try {
        val n = SparkEntry.queries(name)(spark, wideDir).count()
        val _ = n // row counts are data-dependent; not throwing is the contract
      } finally CacheRegistry.releaseAll()
    }
  }
}
