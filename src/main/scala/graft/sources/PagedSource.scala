package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental paged external-store source with resume.
  *
  * The reference reads external stores in driver-side chunk loops: SODA with
  * a windowed `$limit` fetch (main.py:79-132), CARTO ids in chunks of 200
  * with sleeps (main.py:877-888, 960), and the walkmapper row-sync
  * (walkmapper/mysql2carto.py) pages a MySQL table into a keyed sink. Those
  * loops exist because a single Python process is both the scheduler and the
  * only worker. The Spark-native shape:
  *
  *  - the page index (offset ranges) is a tiny deterministic Dataset;
  *  - each page is fetched INSIDE a task (`mapPartitions`), so 1000
  *    executors page the store concurrently instead of one driver loop —
  *    per-page retry with bounded attempts replaces sleep loops;
  *  - resume is a ledger of committed page ids: a restart anti-joins the
  *    page index against the ledger and fetches only what's missing —
  *    the same idempotence the reference gets from `NOT IN (socrata_id…)`,
  *    but at page granularity so no fetched byte is ever re-fetched.
  *
  * Keyed row-sync (mysql2carto) is then `read(...)` piped into
  * `WarehouseSink.merge` — source pages in, keyed merge out.
  */
object PagedSource {

  /** One fetch unit: rows [offset, offset + limit). */
  final case class Page(index: Long, offset: Long, limit: Int)

  /** A connector to a paged store. Implementations must be serializable —
    * fetch runs inside executor tasks. Transient failures should throw;
    * the runner retries per page. */
  trait PageReader[A] extends Serializable {
    def fetch(offset: Long, limit: Int): Seq[A]
  }

  /** The page index for a store of `total` rows. */
  def pages(total: Long, pageSize: Int): Seq[Page] = {
    require(pageSize > 0, "pageSize must be positive")
    val n = (total + pageSize - 1) / pageSize
    (0L until n).map(i =>
      Page(i, i * pageSize, math.min(pageSize.toLong, total - i * pageSize).toInt))
  }

  private def fetchWithRetry[A](r: PageReader[A], p: Page, maxAttempts: Int): Seq[A] = {
    var attempt = 0
    var out: Seq[A] = null
    while (out == null && attempt < maxAttempts) {
      attempt += 1
      try out = r.fetch(p.offset, p.limit)
      catch {
        case e: Exception if attempt < maxAttempts => val _ = e
      }
    }
    // a reader returning null (rather than Nil or throwing) is a broken
    // connector — fail the task instead of spinning forever
    if (out == null) throw new IllegalStateException(
      s"page ${p.index}: fetch returned null after $attempt attempts")
    out
  }

  /** Distributed paged read: every page not yet in the ledger is fetched in
    * parallel with per-page retry. Pass `ledgerPath` to make the read
    * resumable; call `commit` after the downstream write succeeds. */
  def read[A: Encoder](spark: SparkSession, reader: PageReader[A], total: Long,
      pageSize: Int, maxAttempts: Int = 3, ledgerPath: Option[String] = None): Dataset[A] = {
    import spark.implicits._
    val all = spark.createDataset(pages(total, pageSize))
    val todo = ledgerPath match {
      case Some(lp) =>
        val done = committedPages(spark, lp)
        if (done.isEmpty) all
        else all.join(broadcast(done.toSeq.toDF("index")), Seq("index"), "left_anti").as[Page]
      case None => all
    }
    // spread pages across the cluster; each task walks its own pages
    todo.repartition(spark.sparkContext.defaultParallelism min 64)
      .mapPartitions(_.flatMap(p => fetchWithRetry(reader, p, maxAttempts)))
  }

  /** Page ids already landed (empty when no ledger exists yet). */
  def committedPages(spark: SparkSession, ledgerPath: String): Set[Long] =
    try spark.read.parquet(ledgerPath).select("index").collect().map(_.getLong(0)).toSet
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => Set.empty
    }

  /** Record pages as committed AFTER their rows are durably written. */
  def commit(spark: SparkSession, ledgerPath: String, pageIdx: Seq[Long]): Unit = {
    import spark.implicits._
    pageIdx.toDF("index").write.mode(SaveMode.Append).parquet(ledgerPath)
  }
}
