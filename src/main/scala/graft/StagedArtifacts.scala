package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.LogicalRDD

/** Session-scoped staged-artifact registry with SUPERSEDE EVICTION.
  *
  * The staging ladder (MinHash sketch → banded pair counts → inverted
  * shingle index → verified pair graph) materializes each rung as an eager
  * `localCheckpoint` shared by every consumer in the session — the
  * in-session form of the parquet tables a nightly 100 TB pipeline writes
  * between jobs. The artifact deliberately outlives any one query
  * (`CacheRegistry`'s per-query release never touches it), which creates
  * the one leak that contract allows: a long-lived session whose corpus is
  * REWRITTEN re-keys on the new content fingerprint and, without eviction,
  * the superseded checkpoint's blocks stay pinned on executors until app
  * exit.
  *
  * This registry closes that: entries key on (appId, artifact name) and
  * carry their content fingerprint as a VALUE. When a key re-resolves to a
  * new fingerprint, the stale entry's checkpoint RDD is unpersisted (its
  * blocks leave executor storage immediately; the data is stale by
  * definition, so losing it is correct) before the fresh build's result is
  * handed out. Entries for other artifacts — including other dirs of the
  * same family — are never touched. `StagedEvictionSpec` proves the
  * contract end to end.
  *
  * Concurrency: the build runs OUTSIDE the map's bin locks (a ladder rung
  * builds by staging its parent rung — a nested `stage` call — and
  * ConcurrentHashMap.compute forbids that recursion). Each entry memoizes
  * its frame under its own monitor, so concurrent builders of ONE artifact
  * serialize while different artifacts (including a rung and its parent)
  * never share a lock — the ladder is a DAG, so no cycle exists.
  *
  * SUPERSEDE vs IN-FLIGHT READERS (contract, not a bug): eviction is
  * immediate by design — the stale data is wrong by definition, and a
  * nightly session cannot afford to pin 100 TB-scale checkpoint blocks
  * behind a grace period. A `localCheckpoint` truncates lineage, so a
  * reader that obtained the OLD fingerprint's frame and is still running
  * jobs on it when a supersede lands will fail ("checkpoint block not
  * found") rather than silently recompute. Callers that rewrite a staged
  * artifact's source concurrently with readers of the old generation must
  * quiesce those readers first (the gate and every in-repo consumer run
  * read-then-supersede sequentially; `clear(prefix)` has the same
  * semantics). Readers at the SAME fingerprint are always safe — supersede
  * only fires on a fingerprint change. */
object StagedArtifacts {

  private final class Entry(val fingerprint: String, build0: () => DataFrame) {
    private var built: DataFrame = null
    /** Memoized build — at most one builder runs per entry. */
    def df: DataFrame = synchronized {
      if (built == null) built = build0()
      built
    }
    /** Release checkpoint blocks if (and only if) this entry ever built. */
    def unpersistIfBuilt(): Unit = synchronized {
      if (built != null) unpersistCheckpoint(built)
    }
  }

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Resolve artifact `name` at content `fingerprint`, building (and
    * staging — `build` must return an eagerly-materialized frame, normally
    * `localCheckpoint(true)`) on first use or on supersede. Same
    * fingerprint → the staged frame, zero recompute. New fingerprint →
    * the stale entry's checkpoint is unpersisted and the fresh build
    * replaces it.
    *
    * DISK MODE (opt-in): when `spark.graft.stageDir` (conf) or
    * `SPARK_GRAFT_STAGE_DIR` (env) names a directory, rungs persist there
    * as parquet under `<dir>/<artifact>/fp=<md5(fingerprint)>` — the
    * "nightly pipeline writes staging tables" posture made literal. A
    * restarted session (or another session sharing the dir) finds
    * yesterday's rung on disk and reads it instead of rebuilding; a new
    * fingerprint writes its own rung and DELETES superseded fingerprint
    * dirs of the same artifact (supersede-overwrite, the eviction contract
    * on disk). Completion is judged by Spark's `_SUCCESS` marker, so a
    * torn write rebuilds instead of serving partial data. */
  def stage(s: SparkSession, name: String, fingerprint: String)
      (build: => DataFrame): DataFrame = {
    val key = s"${s.sparkContext.applicationId}#$name"
    val disk = stageRoot(s)
    while (true) {
      val cur = entries.get(key)
      if (cur != null && cur.fingerprint == fingerprint) return cur.df
      val fresh = new Entry(fingerprint,
        disk match {
          case Some(root) => () => diskResolve(s, root, name, fingerprint, () => build)
          case None => () => build
        })
      val installed =
        if (cur == null) entries.putIfAbsent(key, fresh) == null
        else entries.replace(key, cur, fresh)
      if (installed) {
        if (cur != null) cur.unpersistIfBuilt()
        return fresh.df
      }
      // lost the install race — re-read and re-decide
    }
    throw new IllegalStateException("unreachable")
  }

  /** Whether disk-mode staging is active for this session (the registry's
    * storage column reads this). */
  private[graft] def diskMode(s: SparkSession): Boolean = stageRoot(s).isDefined

  private def stageRoot(s: SparkSession): Option[String] =
    Option(s.conf.get("spark.graft.stageDir", null))
      .orElse(sys.env.get("SPARK_GRAFT_STAGE_DIR"))
      .filter(_.nonEmpty)

  /** Disk-mode resolution: read the rung if a COMPLETE parquet for this
    * fingerprint exists; otherwise build, persist, evict superseded
    * fingerprint dirs, release the build's checkpoint blocks (the parquet
    * is now the authority), and serve the read-back frame.
    *
    * All probes and deletions go through Hadoop's `FileSystem` resolved
    * FROM the stage path itself — so a non-local stage dir (`hdfs://`,
    * `s3a://`) gets the same reuse and supersede-eviction semantics as
    * `file:`; a `java.io.File` probe would silently never see a remote
    * `_SUCCESS` and rebuild + rewrite the rung every session while stale
    * fingerprint dirs accumulate forever. */
  private def diskResolve(s: SparkSession, root: String, name: String,
      fingerprint: String, build: () => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val safeName = name.replaceAll("[^A-Za-z0-9._-]", "_")
    val fpHash = java.security.MessageDigest.getInstance("MD5")
      .digest(fingerprint.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val artDir = new Path(root, safeName)
    val fs = artDir.getFileSystem(s.sparkContext.hadoopConfiguration)
    val path = new Path(artDir, s"fp=$fpHash")
    if (!fs.exists(new Path(path, "_SUCCESS"))) {
      val built = build()
      built.write.mode("overwrite").parquet(path.toString)
      unpersistCheckpoint(built)
      // supersede-overwrite: stale fingerprints of THIS artifact only
      val stale =
        if (fs.exists(artDir)) fs.listStatus(artDir).toSeq else Seq.empty
      stale.map(_.getPath)
        .filter(p => p.getName.startsWith("fp=") && p.getName != s"fp=$fpHash")
        .foreach(p => fs.delete(p, true): Unit)
    }
    s.read.parquet(path.toString)
  }

  /** Drop (and unpersist) every entry whose artifact name starts with
    * `prefix` — the explicit-invalidation hook behind the per-family
    * `clear*Cache()` entry points. Empty prefix clears everything. */
  def clear(prefix: String = ""): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.substring(e.getKey.indexOf('#') + 1).startsWith(prefix)) {
        e.getValue.unpersistIfBuilt()
        it.remove()
      }
    }
  }

  /** Release the checkpoint blocks behind a `localCheckpoint`ed frame: the
    * frame's logical plan IS the `LogicalRDD` over the persisted RDD, so
    * unpersisting that RDD frees the blocks (non-blocking; the entry is
    * gone from `sc.getPersistentRDDs` synchronously). */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ =>
    }
}
