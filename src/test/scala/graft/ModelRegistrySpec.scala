package graft

import org.scalatest.funsuite.AnyFunSuite

/** `model_registry` contract: every fingerprint recomputes independently
  * through the public model seams, the staged-rung fingerprint IS the
  * disk-mode `fp=` directory name, and memory-mode ≡ disk-mode output
  * row-for-row apart from the storage column. */
class ModelRegistrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def snapshot(): Map[String, (String, String, Long, String)] = {
    val m = SparkEntry.queries("model_registry")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))).toMap
    CacheRegistry.releaseAll()
    m
  }

  test("all nineteen artifacts present; fingerprints recompute through the public seams") {
    val got = snapshot()
    assert(got.keySet == Set(
      "classifier/quality_weights", "embedding/kmeans_centroids",
      "embedding/pca_model", "tokenizer/bpe_vocab", "tokenizer/unigram_vocab",
      "dedup/sketch", "dedup/pairCounts", "dedup/invIndex",
      "dedupClusters/verifiedPairs",
      "graph/vertices", "graph/citation", "graph/simpleEdges",
      "graph/adjacency", "graph/directedSimple",
      "text/lmBigrams", "text/lmScored", "text/winnowFp",
      "sim/knnGraph", "sim/bandIndex"), got.keySet)
    // classifier weights: fingerprint = md5 of the broadcast array
    val w = text.QualityClassifier.modelFor(spark, sf)
    assert(got("classifier/quality_weights")._2 == md5hex(w.mkString("|")))
    assert(got("classifier/quality_weights")._3 == w.length.toLong)
    // staged rungs: fingerprint = md5(content fp) — the fp= dir name — and
    // n_items = the rung's row count
    val rungFp = md5hex(dedup.DedupQueries.docFp(spark, sf))
    Seq("dedup/sketch", "dedup/pairCounts", "dedup/invIndex",
      "dedupClusters/verifiedPairs",
      "graph/vertices", "graph/citation", "graph/simpleEdges",
      "graph/adjacency", "graph/directedSimple",
      "text/lmBigrams", "text/lmScored", "text/winnowFp").foreach { r =>
      assert(got(r)._1 == "staged_rung" && got(r)._2 == rungFp, r)
    }
    assert(got("dedup/sketch")._3 ==
      dedup.DedupQueries.stagedSketch(spark, sf).count())
    // sim/knnGraph + sim/bandIndex key on the EMBEDDINGS fingerprint
    val embFp = md5hex(sources.TableFingerprint.of(spark, s"$sf/embeddings.parquet"))
    assert(got("sim/knnGraph")._1 == "staged_rung" && got("sim/knnGraph")._2 == embFp)
    assert(got("sim/bandIndex")._1 == "staged_rung" && got("sim/bandIndex")._2 == embFp)
    // the band index is one row per vector by construction
    assert(got("sim/bandIndex")._3 ==
      Tables.embeddings(spark, sf).count())
    // graph-ladder internal consistency: adjacency is exactly 2× the
    // simple edges; citation is exactly 3× the vertex count
    assert(got("graph/adjacency")._3 == 2 * got("graph/simpleEdges")._3)
    assert(got("graph/citation")._3 == 3 * got("graph/vertices")._3)
    // every fingerprint is 32-hex, every model non-empty
    got.values.foreach { case (_, fp, n, storage) =>
      assert(fp.matches("[0-9a-f]{32}") && n > 0 && storage == "memory")
    }
  }

  test("disk mode: same rows, rungs report disk, fp= dirs on disk match the fingerprint column") {
    val mem = snapshot()
    val dir = java.nio.file.Files.createTempDirectory("graft_registry").toString
    spark.conf.set("spark.graft.stageDir", dir)
    // supersede the in-memory rungs so they rebuild through the disk path
    StagedArtifacts.clear("dedup")
    StagedArtifacts.clear("graph/")
    StagedArtifacts.clear("text/lm")
    StagedArtifacts.clear("text/winnowFp")
    StagedArtifacts.clear("sim/knnGraph")
    StagedArtifacts.clear("sim/bandIndex")
    try {
      val disk = snapshot()
      assert(disk.keySet == mem.keySet)
      mem.foreach { case (artifact, (kind, fp, n, _)) =>
        val (dKind, dFp, dN, dStorage) = disk(artifact)
        assert(dKind == kind && dFp == fp && dN == n,
          s"$artifact drifted between storage modes")
        val expStorage = if (kind == "staged_rung") "disk" else "memory"
        assert(dStorage == expStorage, s"$artifact storage $dStorage")
        if (kind == "staged_rung") {
          // staging keys carry the corpus dir (`<artifact>#<dir>`); the
          // physical layout sanitizes that full key
          val art = new java.io.File(dir,
            s"$artifact#$sf".replaceAll("[^A-Za-z0-9._-]", "_"))
          assert(new java.io.File(art, s"fp=$fp").isDirectory,
            s"$artifact: no fp=$fp rung on disk under $art")
        }
      }
    } finally {
      spark.conf.unset("spark.graft.stageDir")
      StagedArtifacts.clear("dedup")
      StagedArtifacts.clear("graph/")
      StagedArtifacts.clear("text/lm")
      StagedArtifacts.clear("text/winnowFp")
      StagedArtifacts.clear("sim/knnGraph")
      StagedArtifacts.clear("sim/bandIndex")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("frozen-fixture canary: complete output pinned (file-listing fingerprints masked)") {
    // the staged-rung fingerprint derives from the parquet FILE LISTING
    // (names/sizes/mtimes — the supersede-detection contract), and the
    // frozen fixture is rewritten per JVM, so that one column is masked;
    // the registry test above separately proves it equals md5(docFp).
    // Everything else — artifact set, kinds, model fingerprints, sizes,
    // storage — is pinned as a complete-output digest, the
    // RowsOnlyCanarySpec convention.
    val rows = SparkEntry.queries("model_registry")(spark, FrozenFixtures.dir(spark))
      .collect()
    CacheRegistry.releaseAll()
    val rendered = rows.map { r =>
      val cells = r.toSeq.map(v => if (v == null) "∅" else v.toString)
      val masked = if (cells(1) == "staged_rung") cells.updated(2, "<content-fp>") else cells
      masked.mkString("|")
    }.toSeq.sorted
    val md5 = md5hex(rendered.mkString("\n"))
    assert(rows.length == 19, s"row count drifted: ${rows.length}")
    assert(rendered.contains(
      "classifier/quality_weights|logreg_weights|da9e10ffd96b2fad8e9d4fbed722afcc|67|memory"),
      s"anchor row vanished — rows now: ${rendered.take(3)}")
    assert(md5 == "c244d0f2edb68340bcbabdb8298018a9", // re-captured r16: +text/winnowFp rung
      s"complete-output digest drifted ($md5); if the change is a DELIBERATE " +
        "semantic update, re-capture the frozen values")
  }
}
