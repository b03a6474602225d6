package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

/** The StagedArtifacts SUPERSEDE-EVICTION contract, end to end: a session
  * that rewrites its corpus mid-flight must (a) recompute the staged
  * artifact from the new content, (b) release the superseded checkpoint's
  * blocks (gone from `sc.getPersistentRDDs` — the leak a nightly session
  * re-ingesting a mutating corpus cannot afford), and (c) leave every
  * OTHER staged entry untouched (same object, still persisted). */
class StagedEvictionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def checkpointRddId(df: DataFrame): Int =
    df.queryExecution.logical.collect { case lr: LogicalRDD => lr.rdd.id }.head

  private def writeDocs(dir: String, texts: Seq[String]): Unit = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("corpus rewrite recomputes, evicts the stale checkpoint, spares siblings") {
    val dir = java.nio.file.Files.createTempDirectory("staged_evict").toString
    val sibling = java.nio.file.Files.createTempDirectory("staged_keep").toString
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    writeDocs(dir, Seq(s"first corpus $words", s"second doc $words"))
    writeDocs(sibling, Seq(s"sibling corpus $words"))

    val v1 = graft.dedup.DedupQueries.stagedSketch(spark, dir)
    val keep = graft.dedup.DedupQueries.stagedSketch(spark, sibling)
    val (v1Id, keepId) = (checkpointRddId(v1), checkpointRddId(keep))
    assert(spark.sparkContext.getPersistentRDDs.contains(v1Id),
      "staging must persist the checkpoint")
    assert(v1.count() == 2)

    // same fingerprint → the staged frame itself, zero recompute
    assert(graft.dedup.DedupQueries.stagedSketch(spark, dir) eq v1)

    // REWRITE the corpus (3 docs now — the count proves recompute)
    writeDocs(dir, Seq(s"new corpus $words", s"new doc $words", s"third $words"))
    val v2 = graft.dedup.DedupQueries.stagedSketch(spark, dir)

    // (a) the new fingerprint recomputed from the new content
    assert(!(v2 eq v1), "rewritten corpus must re-stage")
    assert(v2.count() == 3, "staged frame must reflect the new corpus")
    // (b) the superseded checkpoint's blocks are gone
    assert(!spark.sparkContext.getPersistentRDDs.contains(v1Id),
      "stale checkpoint must be unpersisted on supersede")
    assert(spark.sparkContext.getPersistentRDDs.contains(checkpointRddId(v2)))
    // (c) the sibling artifact was never touched
    assert(graft.dedup.DedupQueries.stagedSketch(spark, sibling) eq keep)
    assert(spark.sparkContext.getPersistentRDDs.contains(keepId),
      "unrelated staged entries keep their blocks")

    // explicit invalidation releases everything in the family
    graft.dedup.DedupQueries.clearSketchCache()
    assert(!spark.sparkContext.getPersistentRDDs.contains(keepId))
  }

  test("nested staging never deadlocks or recursive-updates (a rung builds its parent)") {
    // the ladder's real shape: building one artifact stages another. The
    // map's bin locks must never be held during a build — with
    // computeIfAbsent/compute this threw IllegalStateException(Recursive
    // update) whenever the two keys collided in a bin (found by the full
    // suite on the empty-corpus fixture). Exercise MANY nested pairs so a
    // bin collision is certain regardless of hashing.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    (0 until 64).foreach { i =>
      val outer = StagedArtifacts.stage(spark, s"nestSpec/outer$i", "fp") {
        val inner = StagedArtifacts.stage(spark, s"nestSpec/inner$i", "fp") {
          Seq(i.toLong).toDF("v").localCheckpoint(true)
        }
        inner.select((col("v") + 1L).as("v")).localCheckpoint(true)
      }
      assert(outer.head().getLong(0) == i + 1L)
    }
    StagedArtifacts.clear("nestSpec/")
  }
}
