package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{DedupClusters, DedupQueries}

/** Training-corpus builder: the LLM-data-pipeline operators composed into
  * one job, the way CrashPipeline composes the reference ETL surface.
  *
  *   quality gate (incl. repetition metrics) → exact dedup → near-dup
  *   cluster canonicalization → benchmark decontamination → deterministic
  *   stratified sampling → sequence packing
  *
  * Each stage is the same logic as its standalone oracle-checked operator;
  * the composition stays declarative except the (iterative) cluster step.
  * Scale shape: the corpus is filtered map-side first (cheapest cut), the
  * only shuffles are the dedup groupBy, the sparse near-dup machinery and
  * the per-shard packing window; the benchmark set rides along as a
  * broadcast.
  */
object CorpusPipeline {

  /** Stages 1-5 (quality gate → exact dedup → near-dup canonicalization →
    * decontamination → deterministic sample): the cleaned corpus both
    * products consume. */
  def cleaned(s: SparkSession, dir: String,
      minWords: Long = 10, maxStopRatio: Double = 0.6,
      maxTopWordFrac: Double = 0.5, maxDupBigramFrac: Double = 0.9,
      benchmarkMaxOverlap: Long = 20, sampleBucketOf100: Long = 80): DataFrame = {
    graft.functions.HashExprs.register(s)

    // 1. quality gate (map-side only): length/stopword shape + Gopher-style
    // repetition cut via the compiled RepStats expression
    val ws = split(col("text"), "\\s+")
    val stop = size(filter(ws, w => w.isin("the", "a", "of", "and", "in"))).cast("double")
    val rs = graft.functions.HashExprs.repStats(col("text"))
    val quality = Tables.documents(s, dir)
      .withColumn("n_words", size(ws).cast("long"))
      .withColumn("rs", rs)
      .filter(col("n_words") >= minWords &&
        stop / col("n_words") <= maxStopRatio &&
        col("rs.top_word_n").cast("double") / col("rs.n_words") <= maxTopWordFrac &&
        (col("rs.n_bigrams") === 0 ||
          col("rs.dup_bigram_n").cast("double") / col("rs.n_bigrams") <= maxDupBigramFrac))
      .drop("rs")

    // 2. exact dedup: keep the min doc_id per content hash
    val keepers = quality
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exactDeduped = quality.join(keepers, "doc_id")

    // 3. near-dup canonicalization: drop non-canonical cluster members
    val clusters = DedupClusters.clusters(s, dir)
      .filter(col("doc_id") =!= col("canonical"))
      .select(col("doc_id"))
    val nearDeduped = exactDeduped.join(clusters, Seq("doc_id"), "left_anti")

    // 4. decontamination vs the benchmark shingle set (broadcast)
    val sh = DedupQueries.shingles(col("text"))
    val bench = Tables.documents(s, dir).filter(col("doc_id") < 10)
      .select(explode(DedupQueries.shingles(col("text"))).as("shingle"))
      .agg(array_sort(collect_set(col("shingle"))).as("bench_sh"))
    val clean = nearDeduped
      .withColumn("sh", sh)
      .crossJoin(broadcast(bench))
      .filter(col("doc_id") >= 10 &&
        size(array_intersect(col("sh"), col("bench_sh"))) < benchmarkMaxOverlap)
      .drop("sh", "bench_sh")

    // 5. deterministic sample (content-stable hash bucket)
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 100
    clean.filter(bucket < sampleBucketOf100)
      .select("doc_id", "text", "lang", "source", "n_chars", "n_words")
  }

  /** Training product: stage 6, sequence packing — map each surviving doc
    * to its chunk span in the fixed-window token stream
    * (TextQueries.packSpans — one shared definition of the contract). */
  def build(s: SparkSession, dir: String): DataFrame =
    TextQueries.packSpans(cleaned(s, dir), "n_words")
      .drop("end_pos")
      .orderBy("doc_id")

  /** Retrieval product: the same cleaned corpus split into overlapping
    * `TextQueries.chunk` windows for a RAG/embedding index — stages 1-5
    * shared, no packing pass or training sort paid. */
  def buildRetrievalIndex(s: SparkSession, dir: String): DataFrame = {
    val survivors = cleaned(s, dir).select("doc_id")
    TextQueries.chunk(s, dir)
      .join(survivors, "doc_id")
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Both products in ONE job: `cleaned` (including its iterative cluster
    * machinery) runs once and is checkpointed; both consumers read the
    * materialized survivors. This is the seam a combined nightly build
    * uses — invoked separately the products recompute instead (stateless
    * by default; at warehouse scale the checkpoint becomes a parquet
    * staging table). */
  def buildBoth(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val c = cleaned(s, dir).localCheckpoint(true)
    val packed = TextQueries.packSpans(c, "n_words")
      .drop("end_pos")
      .orderBy("doc_id")
    val retrieval = TextQueries.chunk(s, dir)
      .join(c.select("doc_id"), "doc_id")
      .orderBy(col("doc_id"), col("chunk_idx"))
    (packed, retrieval)
  }
}
