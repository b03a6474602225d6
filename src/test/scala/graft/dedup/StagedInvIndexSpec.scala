package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The ladder's 4th rung (`stagedInvIndex`) contract: ONE explode+md5
  * pass per (corpus, fingerprint) per session, with `dedup_containment`
  * and `dedup_recall_eval` both reading 8-byte digest rows from its
  * checkpoint — neither consumer plan may re-inline the shingle explode
  * or the per-shingle md5. */
class StagedInvIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    graft.CacheRegistry.releaseAll()
    p
  }

  test("one staged index object serves the session (same fingerprint, same frame)") {
    assert(DedupQueries.stagedInvIndex(spark, sf) eq
      DedupQueries.stagedInvIndex(spark, sf))
  }

  test("containment reads the staged index: no shingle explode, no per-shingle md5") {
    DedupQueries.stagedInvIndex(spark, sf) // staged
    val p = plan("dedup_containment")
    assert(p.contains("ExistingRDD"), "must scan the staged checkpoint")
    // the ONLY Generate allowed is the r15 symmetric-pair struct explode
    // (2 bounded rows per aggregated pair — it replaced a self-union that
    // re-ran the rare-shingle join twice); the corpus-sized per-shingle
    // explode must stay inside the staging pass
    assert(!p.contains("explode(sh") && !p.contains("explode(shingles"),
      "the shingle explode lives in the staging pass")
    assert(p.contains("explode(array(struct"),
      "both pair directions ride the map-side struct explode")
    assert(!p.contains("shingles3") && !p.contains("minhash_sig"))
  }

  test("recall eval reads the staged index and the staged pair counts") {
    DedupQueries.stagedInvIndex(spark, sf)
    val p = plan("dedup_recall_eval")
    assert(p.contains("ExistingRDD"))
    assert(!p.contains("Generate"), "truth side must not re-explode the corpus")
    assert(!p.contains("shingles3") && !p.contains("minhash_sig"))
  }

  test("supersede cascades across the ladder: pair counts and inv index re-key too") {
    import spark.implicits._
    def writeDocs(dir: String, texts: Seq[String]): Unit =
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def rddId(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.logical.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }.head
    val dir = java.nio.file.Files.createTempDirectory("staged_ladder").toString
    val words = (1 to 40).map(i => s"v$i").mkString(" ")
    writeDocs(dir, Seq(s"a $words", s"b $words"))
    val p1 = DedupQueries.bandedPairCounts(spark, dir)
    val i1 = DedupQueries.stagedInvIndex(spark, dir)
    val (p1Id, i1Id) = (rddId(p1), rddId(i1))

    writeDocs(dir, Seq(s"c $words", s"d $words", s"e $words"))
    val p2 = DedupQueries.bandedPairCounts(spark, dir)
    val i2 = DedupQueries.stagedInvIndex(spark, dir)
    assert(!(p2 eq p1) && !(i2 eq i1))
    assert(!spark.sparkContext.getPersistentRDDs.contains(p1Id))
    assert(!spark.sparkContext.getPersistentRDDs.contains(i1Id))
  }
}
