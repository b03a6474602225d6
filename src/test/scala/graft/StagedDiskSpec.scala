package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The StagedArtifacts DISK MODE contract (`spark.graft.stageDir`):
  * (a) a staged rung persists as parquet under
  *     `<dir>/<artifact>/fp=<md5(fingerprint)>`;
  * (b) a restarted session (simulated by clearing the in-memory registry)
  *     REUSES the on-disk rung — the build thunk never runs again;
  * (c) a new fingerprint writes its own rung and deletes the superseded
  *     fingerprint dir (supersede-overwrite on disk);
  * (d) unrelated artifacts in the same stage dir are untouched;
  * (e) with the conf unset, nothing is ever written to disk. */
class StagedDiskSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fpDirs(root: String, art: String): Seq[String] = {
    val f = new java.io.File(root, art)
    Option(f.listFiles()).getOrElse(Array.empty).map(_.getName).toSeq.sorted
  }

  test("disk mode: persist, restart-reuse, supersede-overwrite, sibling isolation") {
    val root = java.nio.file.Files.createTempDirectory("stage_disk").toString
    spark.conf.set("spark.graft.stageDir", root)
    try {
      var builds = 0
      def buildFrame(vs: Seq[Long]) = {
        builds += 1
        vs.toDF("v").localCheckpoint(true)
      }

      // (a) first stage writes the rung to disk
      val v1 = StagedArtifacts.stage(spark, "diskSpec/rung", "fpA") { buildFrame(Seq(1L, 2L)) }
      assert(builds == 1)
      assert(v1.orderBy(col("v")).as[Long].collect().toSeq == Seq(1L, 2L))
      assert(fpDirs(root, "diskSpec_rung").size == 1, "one fingerprint dir on disk")
      // and the staged read is a parquet scan, not a pinned checkpoint
      assert(spark.sparkContext.getPersistentRDDs.isEmpty ||
        !v1.queryExecution.logical.toString.contains("LogicalRDD"))

      // same session, same fingerprint: memoized, no rebuild
      StagedArtifacts.stage(spark, "diskSpec/rung", "fpA") { buildFrame(Seq(1L, 2L)) }
      assert(builds == 1)

      // sibling artifact gets its own directory
      StagedArtifacts.stage(spark, "diskSpec/other", "fpA") { buildFrame(Seq(9L)) }
      assert(builds == 2)

      // (b) "restart": clear the in-memory registry — the rung must come
      // back from disk without the build thunk running
      StagedArtifacts.clear("diskSpec/")
      val v2 = StagedArtifacts.stage(spark, "diskSpec/rung", "fpA") {
        buildFrame(Seq(999L)) // would poison the data if it ran
      }
      assert(builds == 2, "restarted session must reuse the on-disk rung")
      assert(v2.orderBy(col("v")).as[Long].collect().toSeq == Seq(1L, 2L))

      // (c) supersede: new fingerprint replaces the rung ON DISK
      val dirsBefore = fpDirs(root, "diskSpec_rung")
      val v3 = StagedArtifacts.stage(spark, "diskSpec/rung", "fpB") { buildFrame(Seq(7L, 8L, 9L)) }
      assert(builds == 3)
      assert(v3.count() == 3)
      val dirsAfter = fpDirs(root, "diskSpec_rung")
      assert(dirsAfter.size == 1 && dirsAfter != dirsBefore,
        "superseded fingerprint dir must be deleted, replaced by the new one")
      // (d) the sibling artifact's rung survived
      assert(fpDirs(root, "diskSpec_other").size == 1)
      StagedArtifacts.clear("diskSpec/")
    } finally spark.conf.unset("spark.graft.stageDir")

    // (e) conf unset: memory mode, nothing written
    val probe = java.nio.file.Files.createTempDirectory("stage_off").toString
    StagedArtifacts.stage(spark, "diskSpec/off", "fpZ") {
      Seq(1L).toDF("v").localCheckpoint(true)
    }
    assert(Option(new java.io.File(probe).listFiles()).getOrElse(Array.empty).isEmpty)
    StagedArtifacts.clear("diskSpec/")
  }
}
