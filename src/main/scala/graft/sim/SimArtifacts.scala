package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashExprs

/** Session-scoped staged artifacts for the SIMILARITY family — the fourth
  * instance of the staging-ladder discipline ([[graft.StagedArtifacts]];
  * dedup ladder → graph ladder → LM ladder → THIS), per the r14 verdict's
  * ordered task #3.
  *
  * Before this rung, five operators each recomputed the full-corpus
  * hyperplane sign-bit pass per run — `ann_lsh_bucketed`,
  * `ann_multiprobe`, `dedup_embedding_lsh`, `emb_bitext_mine`, and
  * `ann_knn_graph`'s round-0 start: five parquet scans + five compiled
  * `HyperplaneBands` passes over the same vectors where one staging pass
  * suffices. At 100 TB that is four redundant full-corpus scans per
  * nightly session; a real pipeline writes the banded signature table
  * once and every LSH consumer reads it.
  *
  * The rung is ONE ROW PER VECTOR — `(vec_id, label, emb, bands)` with
  * `bands` the compiled 4×4-bit hyperplane band-key array — NOT the
  * exploded (vec_id, band, bkey) form: the explode is a free map-side
  * `posexplode` each consumer applies on read, while storing it exploded
  * would quadruple the checkpointed embedding payload. `ann_knn_graph`
  * reads the un-exploded array directly (it repacks 2×8-bit keys from the
  * 4×4-bit items), which is exactly why the array form is the right rung
  * grain. Keyed on the EMBEDDINGS content fingerprint (the `sim/knnGraph`
  * convention — this family's corpus is the vector table, not documents);
  * supersede evicts on rewrite; disk mode persists it as parquet like
  * every other ladder. Registered in `model_registry` as `sim/bandIndex`.
  *
  * Semantics are identical by construction: the rung body is the exact
  * select + `HyperplaneBands` chain the five consumers inlined before, so
  * their oracles (which replay the sign-bit pass from the raw embeddings
  * table via `HashExprs.hyperplaneChainSql`) are untouched. */
object SimArtifacts {

  /** Explicit invalidation for the staged band index (the per-family
    * `clear*Cache()` convention). */
  def clearBandCache(): Unit = graft.StagedArtifacts.clear("sim/bandIndex")

  private[graft] def embFp(s: SparkSession, dir: String): String =
    graft.sources.TableFingerprint.of(s, s"$dir/embeddings.parquet")

  /** The banded signature table: one corpus scan + one compiled sign-bit
    * pass per (corpus, fingerprint), shared by every LSH consumer in the
    * session. */
  private[graft] def stagedBandIndex(s: SparkSession, dir: String): DataFrame =
    graft.StagedArtifacts.stage(s, s"sim/bandIndex#$dir", embFp(s, dir)) {
      HashExprs.register(s)
      val raw = Tables.embeddings(s, dir)
      // planted spec fixtures write (vec_id, embedding) only; the label
      // column is the cross-language consumer's concern, null elsewhere
      val labeled =
        if (raw.columns.contains("label")) raw
        else raw.withColumn("label", lit(null).cast("int"))
      labeled
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("emb"))
        .withColumn("bands", HashExprs.hyperplaneBands(col("emb")))
        .localCheckpoint(true)
    }

  /** The exploded `(vec_id, emb, band, bkey)` view the LSH top-k and
    * embedding-dedup consumers join on — a map-side `posexplode` over
    * checkpoint blocks, no recompute, no shuffle. */
  private[graft] def banded(s: SparkSession, dir: String): DataFrame =
    stagedBandIndex(s, dir)
      .select(col("vec_id"), col("emb"), posexplode(col("bands")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
}
