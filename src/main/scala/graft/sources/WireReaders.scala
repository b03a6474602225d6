package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Wire-shape connectors for the reference's two external stores, as
  * `PagedSource.PageReader` adapters over a pluggable HTTP transport.
  *
  * The reference speaks two dialects:
  *  - Socrata SODA: GET with `$where`/`$order`/`$limit`/`$$app_token`
  *    params; the response body is a bare JSON array of string-field
  *    records, or an error OBJECT carrying `message`
  *    (/root/reference/main.py:79-110).
  *  - CARTO SQL API: GET/POST with a `q` SQL parameter (+ `api_key`);
  *    the response is `{"rows": [...]}`, errors ride an `error` field
  *    (main.py:112-125, 536-552). Long mutations go through the Batch SQL
  *    API: POST a query list → `job_id`, then poll `status` until
  *    done/failed (main.py:556-610).
  *
  * The driver-loop + sleep retry of the reference becomes: page fetches run
  * INSIDE executor tasks via PagedSource (bounded per-page retry, ledger
  * resume), and batch polling is a bounded-attempt status loop. The HTTP
  * transport is an injected trait — the sandbox has no egress, so specs
  * drive these against an in-JVM fake serving the exact wire JSON; a real
  * deployment plugs `java.net.http` in without touching the paging logic.
  */
object WireReaders {

  /** Pluggable HTTP transport. Implementations must be serializable —
    * fetches run inside executor tasks. Transient failures should throw
    * (PagedSource retries per page). `post` carries a JSON body (the CARTO
    * Batch SQL submit); GET-only page readers never call it, so the
    * default refuses loudly rather than forcing every fake to stub it. */
  trait Http extends Serializable {
    def get(url: String, params: Map[String, String]): String
    def post(url: String, body: String): String =
      throw new UnsupportedOperationException("transport does not implement POST")
  }

  /** Jackson rides in with Spark; the mapper lives in a static so reader
    * instances stay trivially serializable. */
  private object Json {
    val mapper = new ObjectMapper()
    def parse(body: String): JsonNode = mapper.readTree(body)
  }

  /** Field map of one JSON object row (SODA serves every value as a
    * string; non-string nodes are rendered as their JSON text). */
  private def fields(node: JsonNode): Map[String, String] = {
    val it = node.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> (if (e.getValue.isTextual) e.getValue.asText else e.getValue.toString)
    }
    b.result()
  }

  /** SODA collision feed pager (main.py:79-110): windowed `$where`, ordered,
    * `$limit`/`$offset` paged. An error OBJECT (SODA signals errors with a
    * dict, not a list — main.py:101-103) throws, so the page retries and
    * then fails the task rather than silently landing zero rows. */
  final class SodaPageReader[A](http: Http, baseUrl: String, where: String,
      order: String, appToken: String, decode: Map[String, String] => A)
      extends PagedSource.PageReader[A] {
    def fetch(offset: Long, limit: Int): Seq[A] = {
      val body = http.get(baseUrl, Map(
        "$where" -> where, "$order" -> order,
        "$limit" -> limit.toString, "$offset" -> offset.toString,
        "$$app_token" -> appToken))
      val root = Json.parse(body)
      if (root.isArray) {
        val b = Seq.newBuilder[A]
        root.forEach(n => b += decode(fields(n)))
        b.result()
      } else if (root.isObject) {
        val msg = Option(root.get("message")).map(_.asText).getOrElse(root.toString)
        throw new java.io.IOException(s"SODA error response: $msg")
      } else throw new java.io.IOException(s"unexpected SODA response: $root")
    }
  }

  /** CARTO SQL API pager (main.py:112-125): `q` = the select with
    * LIMIT/OFFSET appended, rows under `"rows"`, errors under `"error"`. */
  final class CartoSqlPageReader[A](http: Http, baseUrl: String, selectSql: String,
      apiKey: String, decode: Map[String, String] => A)
      extends PagedSource.PageReader[A] {
    def fetch(offset: Long, limit: Int): Seq[A] = {
      val body = http.get(baseUrl,
        Map("q" -> s"$selectSql LIMIT $limit OFFSET $offset", "api_key" -> apiKey))
      val root = Json.parse(body)
      if (root.has("error"))
        throw new java.io.IOException(s"CARTO error: ${root.get("error")}")
      val rows = root.get("rows")
      if (rows == null || !rows.isArray)
        throw new java.io.IOException(s"CARTO response missing rows: $root")
      val b = Seq.newBuilder[A]
      rows.forEach(n => b += decode(fields(n)))
      b.result()
    }
  }

  /** CARTO Batch SQL job lifecycle (main.py:556-610), driver-side like the
    * reference but with BOUNDED polling instead of an unbounded sleep loop.
    * Returns the job id. */
  def startBatchJob(http: Http, baseUrl: String, masterKey: String,
      queries: Seq[String]): String = {
    // POST {"query": [...]} — the reference's exact wire shape
    // (main.py:556-610), JSON-encoded so queries with quotes/newlines
    // survive the trip
    val node = Json.mapper.createObjectNode()
    val arr = node.putArray("query")
    queries.foreach(arr.add)
    val root = Json.parse(http.post(s"$baseUrl?api_key=$masterKey",
      Json.mapper.writeValueAsString(node)))
    // error may be a string, an array, or absent — any non-null error node
    // with content fails the submit (size()==0 for text nodes, so a bare
    // `.size() > 0` check would let a string error fall through)
    val err = root.get("error")
    if (err != null && !err.isNull && (err.isTextual || err.size() > 0))
      throw new java.io.IOException(s"batch submit failed: $err")
    val jobId = root.get("job_id")
    if (jobId == null || jobId.isNull)
      throw new java.io.IOException(s"batch submit returned no job_id: $root")
    jobId.asText
  }

  /** Poll `status` until done (returns), failed (throws with
    * `failed_reason`, main.py:596-599), or attempts run out. `sleep` is
    * injected so specs run instantly. */
  def waitBatchJob(http: Http, baseUrl: String, masterKey: String, jobId: String,
      maxPolls: Int = 60, sleep: () => Unit = () => Thread.sleep(10000L)): String = {
    var polls = 0
    while (polls < maxPolls) {
      polls += 1
      val body = Json.parse(http.get(s"$baseUrl/$jobId?api_key=$masterKey", Map.empty))
      val st = body.get("status").asText
      st match {
        case "done" => return st
        case "running" | "pending" => sleep()
        case "failed" =>
          val reason = Option(body.get("failed_reason")).map(_.asText).getOrElse("unknown")
          throw new java.io.IOException(s"batch job $jobId failed: $reason")
        case other => throw new java.io.IOException(s"batch job $jobId unknown status: $other")
      }
    }
    throw new java.io.IOException(s"batch job $jobId still not done after $maxPolls polls")
  }
}
