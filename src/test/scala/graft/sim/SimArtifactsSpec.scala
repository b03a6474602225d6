package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.HashExprs

/** The staged band-index contract (r14 verdict task #3, the 4th staging
  * ladder): the five LSH consumers — `ann_lsh_bucketed`, `ann_multiprobe`,
  * `dedup_embedding_lsh`, `emb_bitext_mine`, `ann_knn_graph` round 0 —
  * share ONE materialization of the hyperplane banded-signature table per
  * (corpus, fingerprint); rung contents exactly equal the inline sign-bit
  * chain the consumers derived before; supersede evicts on rewrite. */
class SimArtifactsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def checkpointRddId(df: DataFrame): Int =
    df.queryExecution.logical.collect { case lr: LogicalRDD => lr.rdd.id }.head

  private def writeEmb(dir: String, n: Int): Unit = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 8.0 + d)), i % 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("one materialization per fingerprint; rung contents equal the inline sign-bit chain") {
    val dir = java.nio.file.Files.createTempDirectory("band_rung").toString
    writeEmb(dir, 40)
    val r1 = SimArtifacts.stagedBandIndex(spark, dir)
    // same fingerprint → the staged frame ITSELF: a second consumer pays
    // zero recompute (the 5×-scan elimination)
    assert(SimArtifacts.stagedBandIndex(spark, dir) eq r1)
    assert(r1.count() == 40, "one row per vector")
    // rung ≡ the inline definition the consumers used before
    HashExprs.register(spark)
    val inline = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("bands", HashExprs.hyperplaneBands(col("emb")))
    assert(r1.exceptAll(inline).count() == 0 && inline.exceptAll(r1).count() == 0,
      "staged rung must equal the inline banded-signature chain row-for-row")
    // the exploded view is 4 rows per vector with 4-bit keys
    val ex = SimArtifacts.banded(spark, dir)
    assert(ex.count() == 4 * 40)
    assert(ex.agg(max(col("bkey"))).head.getLong(0) <= 15L &&
      ex.agg(min(col("bkey"))).head.getLong(0) >= 0L)
    SimArtifacts.clearBandCache()
  }

  test("corpus rewrite supersedes: recompute on the new fingerprint, stale blocks evicted") {
    val dir = java.nio.file.Files.createTempDirectory("band_rung_evict").toString
    writeEmb(dir, 12)
    val v1 = SimArtifacts.stagedBandIndex(spark, dir)
    val v1Id = checkpointRddId(v1)
    assert(spark.sparkContext.getPersistentRDDs.contains(v1Id))
    assert(v1.count() == 12)
    writeEmb(dir, 25)
    val v2 = SimArtifacts.stagedBandIndex(spark, dir)
    assert(!(v2 eq v1), "rewritten corpus must re-stage")
    assert(v2.count() == 25, "staged index must reflect the new corpus")
    assert(!spark.sparkContext.getPersistentRDDs.contains(v1Id),
      "stale rung checkpoint must be unpersisted on supersede")
    val v2Id = checkpointRddId(v2)
    SimArtifacts.clearBandCache()
    assert(!spark.sparkContext.getPersistentRDDs.contains(v2Id))
  }

  test("consumers read the shared rung: results unchanged vs the pre-rung inline chains") {
    // the refactor must be a pure plumbing change — lsh top-k over the
    // rung equals lsh top-k over a from-scratch banding of the same table
    val sf = TestSpark.sf
    SimArtifacts.clearBandCache()
    val viaRung = AnnLsh.queries("ann_lsh_bucketed")(spark, sf).collect().toSeq
    HashExprs.register(spark)
    val banded = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), col("emb"),
        posexplode(HashExprs.hyperplaneBands(col("emb"))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
    val q = banded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("band"), col("bkey"))
    val c = banded.select(col("vec_id").as("n_id"), col("emb").as("n_emb"), col("band"), col("bkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    val inline = c.join(broadcast(q), Seq("band", "bkey"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", round(graft.dedup.DedupQueries.cosine(col("q_emb"), col("n_emb")), 4))
      .select("q_id", "n_id", "cosine")
      .dropDuplicates("q_id", "n_id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "n_id", "rank", "cosine")
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    graft.CacheRegistry.releaseAll()
    assert(viaRung == inline, "rung-fed lsh must equal the inline chain")
    SimArtifacts.clearBandCache()
  }
}
