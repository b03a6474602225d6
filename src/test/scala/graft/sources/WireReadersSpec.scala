package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** In-JVM fake stores speaking the exact SODA / CARTO wire JSON, with
  * injectable transient and permanent failures (static state works because
  * local[n] shares the JVM with executor tasks). */
object FakeWire {
  val fetches = new AtomicInteger(0)
  val failedOnce = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()

  case class Crash(socrata_id: Long, injured: Long)

  /** Serves `total` SODA records; `failOnce` offsets throw on first attempt;
    * `alwaysFail` offsets throw every time (store outage for that window). */
  class SodaHttp(failOnce: Set[Long], alwaysFail: Set[Long]) extends WireReaders.Http {
    def get(url: String, params: Map[String, String]): String = {
      FakeWire.fetches.incrementAndGet()
      val offset = params("$offset").toLong
      val limit = params("$limit").toInt
      require(params.contains("$where") && params.contains("$$app_token"))
      if (alwaysFail.contains(offset)) throw new java.io.IOException("store down")
      if (failOnce.contains(offset) && FakeWire.failedOnce.putIfAbsent(offset, true) == null)
        throw new java.io.IOException("transient 503")
      (offset until offset + limit)
        .map(i => s"""{"socrata_id":"$i","number_of_persons_injured":"${i % 5}"}""")
        .mkString("[", ",", "]")
    }
  }

  /** SODA error shape: a dict with `message` instead of a list. */
  class SodaErrorHttp extends WireReaders.Http {
    def get(url: String, params: Map[String, String]): String =
      """{"error": true, "message": "query timeout"}"""
  }

  /** CARTO SQL API: rows under "rows", LIMIT/OFFSET parsed from the q. */
  class CartoHttp extends WireReaders.Http {
    private val Lim = ".*LIMIT (\\d+) OFFSET (\\d+)".r
    def get(url: String, params: Map[String, String]): String = params("q") match {
      case Lim(limit, offset) =>
        val rows = (offset.toLong until offset.toLong + limit.toInt)
          .map(i => s"""{"socrata_id": $i, "crashcount": ${1 + i % 3}}""")
          .mkString(",")
        s"""{"rows": [$rows], "total_rows": ${limit.toInt}}"""
      case q => s"""{"error": ["unparsable query: $q"]}"""
    }
  }

  /** Scripted batch-job lifecycle: POST submit → job id; GET polls walk
    * `statuses`. Records the submitted body for wire-shape assertions. */
  class BatchHttp(statuses: Seq[String]) extends WireReaders.Http {
    val polls = new AtomicInteger(0)
    @volatile var postedUrl: String = _
    @volatile var postedBody: String = _
    override def post(url: String, body: String): String = {
      postedUrl = url; postedBody = body
      """{"job_id": "job-42"}"""
    }
    def get(url: String, params: Map[String, String]): String = {
      val i = polls.getAndIncrement()
      s"""{"status": "${statuses(math.min(i, statuses.size - 1))}"}"""
    }
  }
}

class WireReadersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sodaReader(http: WireReaders.Http) =
    new WireReaders.SodaPageReader[FakeWire.Crash](
      http, "https://data.example/resource/crashes.json",
      where = "crash_date >= '2024-01-01'", order = "crash_date DESC", appToken = "tok",
      decode = m => FakeWire.Crash(m("socrata_id").toLong, m("number_of_persons_injured").toLong))

  test("SODA pager: full read over the wire shape, transient 503 retried") {
    FakeWire.fetches.set(0)
    FakeWire.failedOnce.clear()
    val got = PagedSource.read(spark, sodaReader(new FakeWire.SodaHttp(Set(20L), Set.empty)),
        total = 45, pageSize = 10)
      .collect().sortBy(_.socrata_id)
    assert(got.length == 45)
    assert(got.map(_.socrata_id).toSeq == (0L until 45L))
    assert(got.forall(c => c.injured == c.socrata_id % 5))
    assert(FakeWire.fetches.get() == 6, s"5 pages + 1 retry, got ${FakeWire.fetches.get()}")
  }

  test("SODA error dict throws (and so retries) instead of landing zero rows") {
    intercept[Exception] {
      PagedSource.read(spark, sodaReader(new FakeWire.SodaErrorHttp),
        total = 10, pageSize = 10, maxAttempts = 2).collect()
    }
    ()
  }

  test("CARTO SQL pager: rows field, LIMIT/OFFSET paging, error field throws") {
    val reader = new WireReaders.CartoSqlPageReader[(Long, Long)](
      new FakeWire.CartoHttp, "https://carto.example/api/v2/sql",
      selectSql = "SELECT socrata_id, crashcount FROM crashes_table", apiKey = "key",
      decode = m => (m("socrata_id").toLong, m("crashcount").toLong))
    val got = PagedSource.read(spark, reader, total = 25, pageSize = 10)
      .collect().sorted
    assert(got.length == 25)
    assert(got.map(_._1).toSeq == (0L until 25L))
    assert(got.forall { case (id, n) => n == 1 + id % 3 })
    val broken = new WireReaders.CartoSqlPageReader[(Long, Long)](
      new FakeWire.CartoHttp, "u", selectSql = "NOT A SELECT \n", apiKey = "k",
      decode = m => (0L, 0L))
    intercept[Exception] { broken.fetch(0, 10) }
    ()
  }

  test("resume after partial failure, end-to-end into the warehouse merge") {
    val wh = Files.createTempDirectory("wh").toString + "/crashes"
    val ledger = Files.createTempDirectory("ledger").toString + "/pages"

    // Run 1: the store's window past offset 30 is down — land what is
    // reachable (pages 0-2), commit ONLY those pages to the ledger.
    FakeWire.fetches.set(0)
    FakeWire.failedOnce.clear()
    val down = new FakeWire.SodaHttp(Set.empty, alwaysFail = Set(30L, 40L))
    intercept[Exception] {
      PagedSource.read(spark, sodaReader(down), total = 50, pageSize = 10,
        maxAttempts = 2, ledgerPath = Some(ledger)).collect()
    }
    val partial = PagedSource.read(spark, sodaReader(down), total = 30, pageSize = 10,
      ledgerPath = Some(ledger))
      .withColumn("year", lit(2024L)).withColumn("month", expr("1 + socrata_id % 2"))
    WarehouseSink.writeSnapshot(partial, wh)
    PagedSource.commit(spark, ledger, Seq(0L, 1L, 2L))
    assert(spark.read.parquet(wh).count() == 30)

    // Run 2: store healed — the resume fetches ONLY pages 3 and 4 and the
    // keyed merge completes the warehouse (main.py's NOT IN dedup shape,
    // but at page granularity so no fetched byte is re-fetched).
    FakeWire.fetches.set(0)
    val healed = new FakeWire.SodaHttp(Set.empty, Set.empty)
    // localCheckpoint the fetched batch BEFORE the sink: merge scans its
    // batch several times (months, anti-join, union) and re-fetching pages
    // on every scan would waste the store's rate budget
    val rest = PagedSource.read(spark, sodaReader(healed), total = 50, pageSize = 10,
        ledgerPath = Some(ledger))
      .withColumn("year", lit(2024L)).withColumn("month", expr("1 + socrata_id % 2"))
      .localCheckpoint(true)
    WarehouseSink.merge(spark, rest, wh, "socrata_id")
    PagedSource.commit(spark, ledger, Seq(3L, 4L))
    assert(FakeWire.fetches.get() == 2, s"resume must fetch only missing pages, got ${FakeWire.fetches.get()}")
    val after = spark.read.parquet(wh)
    assert(after.count() == 50)
    assert(after.select("socrata_id").collect().map(_.getLong(0)).sorted.toSeq == (0L until 50L))
    // fully resumed ledger → no-op read
    assert(PagedSource.read(spark, sodaReader(healed), total = 50, pageSize = 10,
      ledgerPath = Some(ledger)).isEmpty)
  }

  test("batch job polling: pending/running then done; failed throws; bounded") {
    val http = new FakeWire.BatchHttp(Seq("pending", "running", "done"))
    val queries = Seq("UPDATE t SET x = 1", "UPDATE t SET note = 'it''s \"quoted\"'")
    val id = WireReaders.startBatchJob(http, "https://carto.example/batch", "mk", queries)
    assert(id == "job-42")
    // the submit must be a POST whose body is the reference's exact
    // {"query": [...]} wire shape (main.py:556-610), key on the URL
    assert(http.postedUrl == "https://carto.example/batch?api_key=mk")
    val posted = new com.fasterxml.jackson.databind.ObjectMapper().readTree(http.postedBody)
    assert(posted.get("query").isArray && posted.get("query").size == 2)
    assert((0 until 2).map(posted.get("query").get(_).asText) == queries)
    var slept = 0
    assert(WireReaders.waitBatchJob(http, "b", "mk", id, maxPolls = 10,
      sleep = () => slept += 1) == "done")
    assert(slept == 2, "one sleep per non-terminal status")
    intercept[Exception] {
      WireReaders.waitBatchJob(new FakeWire.BatchHttp(Seq("failed")), "b", "mk", id, maxPolls = 3,
        sleep = () => ())
    }
    intercept[Exception] { // never finishes → bounded, not an infinite loop
      WireReaders.waitBatchJob(new FakeWire.BatchHttp(Seq("running")), "b", "mk", id, maxPolls = 3,
        sleep = () => ())
    }
    ()
  }
}
