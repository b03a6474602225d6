package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** In-JVM fake store: deterministic rows, transient failure on the first
  * attempt of selected pages (local[n] shares the JVM, so static counters
  * observe executor-side fetches). */
object FakeStore {
  val fetches = new AtomicInteger(0)
  val failures = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()

  case class Rec(id: Long, v: String)

  class Reader(failOnceOffsets: Set[Long]) extends PagedSource.PageReader[Rec] {
    def fetch(offset: Long, limit: Int): Seq[Rec] = {
      FakeStore.fetches.incrementAndGet()
      if (failOnceOffsets.contains(offset) &&
          FakeStore.failures.putIfAbsent(offset, true) == null)
        throw new RuntimeException(s"transient failure at offset $offset")
      (offset until offset + limit).map(i => Rec(i, s"row-$i"))
    }
  }
}

class PagedSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("paged read covers the store exactly once, retrying transient failures") {
    FakeStore.fetches.set(0)
    FakeStore.failures.clear()
    val got = PagedSource.read(spark, new FakeStore.Reader(Set(30L)), total = 95, pageSize = 10)
      .collect().sortBy(_.id)
    assert(got.length == 95)
    assert(got.map(_.id).toSeq == (0L until 95L))
    assert(got.last.v == "row-94")
    // 10 pages + 1 retry of the transiently-failing page
    assert(FakeStore.fetches.get() == 11, s"fetches = ${FakeStore.fetches.get()}")
  }

  test("a page that keeps failing propagates after maxAttempts") {
    class AlwaysFail extends PagedSource.PageReader[FakeStore.Rec] {
      def fetch(offset: Long, limit: Int): Seq[FakeStore.Rec] =
        throw new RuntimeException("store down")
    }
    intercept[Exception] {
      PagedSource.read(spark, new AlwaysFail, total = 10, pageSize = 10, maxAttempts = 2).collect()
    }
    ()
  }

  test("resume via ledger fetches only uncommitted pages") {
    FakeStore.fetches.set(0)
    FakeStore.failures.clear()
    val ledger = Files.createTempDirectory("ledger").toString + "/pages"
    // first run landed pages 0, 1 and 3 before dying
    PagedSource.commit(spark, ledger, Seq(0L, 1L, 3L))
    val got = PagedSource.read(spark, new FakeStore.Reader(Set.empty),
        total = 50, pageSize = 10, ledgerPath = Some(ledger))
      .collect().map(_.id).sorted.toSeq
    // only pages 2 and 4 fetched → rows 20-29 and 40-49
    assert(got == ((20L until 30L) ++ (40L until 50L)))
    assert(FakeStore.fetches.get() == 2, s"fetches = ${FakeStore.fetches.get()}")
    // committing the rest makes the read a no-op
    PagedSource.commit(spark, ledger, Seq(2L, 4L))
    assert(PagedSource.read(spark, new FakeStore.Reader(Set.empty),
      total = 50, pageSize = 10, ledgerPath = Some(ledger)).isEmpty)
  }

  test("keyed row-sync: paged source piped into the warehouse merge (mysql2carto shape)") {
    val wh = Files.createTempDirectory("wh").toString + "/sync"
    val first = PagedSource.read(spark, new FakeStore.Reader(Set.empty), total = 30, pageSize = 10)
      .withColumn("year", org.apache.spark.sql.functions.lit(2024L))
      .withColumn("month", org.apache.spark.sql.functions.expr("1 + id % 2"))
    WarehouseSink.writeSnapshot(first, wh)
    // source grows + mutates: re-sync pages the store again and merges by key
    class Grown extends PagedSource.PageReader[FakeStore.Rec] {
      def fetch(offset: Long, limit: Int): Seq[FakeStore.Rec] =
        (offset until offset + limit).map(i => FakeStore.Rec(i, s"v2-$i"))
    }
    val second = PagedSource.read(spark, new Grown, total = 40, pageSize = 10)
      .withColumn("year", org.apache.spark.sql.functions.lit(2024L))
      .withColumn("month", org.apache.spark.sql.functions.expr("1 + id % 2"))
    WarehouseSink.merge(spark, second, wh, "id")
    val after = spark.read.parquet(wh)
    assert(after.count() == 40)
    assert(after.filter("v LIKE 'v2-%'").count() == 40, "batch wins on key collision")
  }
}
