package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** #28q `sample_reservoir` — distributed uniform reservoir sample via
  * hash-priority bottom-k (Vitter's reservoir semantics made deterministic
  * and mergeable: assign every document the priority md5(doc_id), keep the
  * k smallest). This is THE distributed form of reservoir sampling — each
  * partition keeps its own k smallest (a per-partition reservoir), and the
  * merge of reservoirs is just "k smallest of the union", which is exactly
  * what Spark's TakeOrderedAndProject computes (per-partition heads, one
  * k-row driver merge — never a global sort). Unlike `rand()`-based
  * TABLESAMPLE the sample is content-stable: the same corpus yields the
  * same sample on any engine, any partitioning, any cluster size, and the
  * sample is INCREMENTALLY maintainable (new docs only displace old ones
  * if their hash is smaller — the bottom-k sketch union). Complements the
  * family: `sample_stratified`/`sample_temperature` pick by rates,
  * `sample_pps_systematic` by weight, this is the unweighted-uniform
  * primitive.
  *
  * Scale: one map-side projection (md5 of an 8-byte id), one TakeOrdered
  * of k rows per partition; zero shuffles, zero windows. */
object Reservoir {

  /** Reservoir size k. */
  val TargetK = 64

  def reservoir(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        md5(col("doc_id").cast("string")).as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(TargetK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_reservoir" -> (reservoir _))

  val oracles: Map[String, String] = Map(
    "sample_reservoir" ->
      s"""SELECT doc_id, lang, n_chars, md5(doc_id::VARCHAR) AS priority
         |FROM documents
         |ORDER BY priority, doc_id
         |LIMIT $TargetK""".stripMargin)
}
