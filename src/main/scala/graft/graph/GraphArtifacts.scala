package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Session-scoped staged artifacts for the GRAPH family — the dedup-ladder
  * discipline ([[graft.StagedArtifacts]]) applied to the 16 link-graph
  * operators (SURVEY.md §2; r13 verdict task #1).
  *
  * Before this rung every graph operator re-derived the shared citation
  * graph privately: one corpus scan + 3-way explode + DISTINCT SHUFFLE of
  * the edge set per operator (16× at bench time, 16 full edge shuffles at
  * 100 TB), and the BFS-family ops each re-materialized their own symmetric
  * adjacency on top. A nightly pipeline stages these as parquet tables
  * between jobs; in-session the staging is an eager `localCheckpoint`
  * registered per (corpus dir, content fingerprint) — built once, shared by
  * every consumer, superseded (and its blocks evicted) when the corpus is
  * rewritten. `clearGraphCache()` is the explicit invalidation; disk mode
  * (`spark.graft.stageDir`) persists the rungs as parquet like every other
  * ladder.
  *
  * The ladder (a DAG — each rung builds FROM its parent rung, so the
  * corpus is scanned once per fingerprint for the whole family):
  *
  *   - `graph/vertices`       (doc_id)           — one corpus scan
  *   - `graph/citation`       (src, dst)         — raw 3-out-degree list
  *   - `graph/simpleEdges`    (u, v)             — undirected, loops
  *     dropped, parallel edges collapsed (THE distinct shuffle, once)
  *   - `graph/adjacency`      (node, nb)         — symmetric expansion
  *   - `graph/directedSimple` (u, v)             — directed, loops
  *     dropped, distinct (scc / reciprocity's graph)
  *
  * Downstream per-operator plans are unchanged: each op's joins and
  * aggregates now read checkpoint blocks instead of re-running the scan +
  * distinct subtree. Semantics are identical by construction — the rung
  * bodies are the exact edge definitions the ops inlined before
  * ([[PageRank.citationEdges]], [[Triangles.simpleEdges]]). */
object GraphArtifacts {

  private def docFp(s: SparkSession, dir: String): String =
    graft.sources.TableFingerprint.of(s, s"$dir/documents.parquet")

  /** Explicit invalidation for every graph rung (the per-family
    * `clear*Cache()` convention). */
  def clearGraphCache(): Unit = graft.StagedArtifacts.clear("graph/")

  /** The corpus vertex set (doc_id) — the one parquet scan the whole
    * family shares; every op's `n = docs.count()` is a cheap count over
    * checkpoint blocks. */
  private[graft] def stagedVertices(s: SparkSession, dir: String): DataFrame =
    graft.StagedArtifacts.stage(s, s"graph/vertices#$dir", docFp(s, dir)) {
      Tables.documents(s, dir).select(col("doc_id")).localCheckpoint(true)
    }

  /** Raw directed citation list (src, dst) — out-degree exactly 3, loops
    * and duplicates KEPT (pagerank / hits depend on the exact out-degree
    * contract). Map-only from the vertex rung. */
  private[graft] def stagedCitation(s: SparkSession, dir: String): DataFrame =
    graft.StagedArtifacts.stage(s, s"graph/citation#$dir", docFp(s, dir)) {
      val docs = stagedVertices(s, dir)
      val n = docs.count()
      // n == 0: citationEdges' `% n` is undefined; the empty frame with
      // the right schema is the correct rung (no consumer reads it — every
      // op early-returns — but ModelRegistry counts it)
      if (n == 0)
        docs.select(col("doc_id").as("src"), col("doc_id").as("dst")).localCheckpoint(true)
      else PageRank.citationEdges(docs, n).localCheckpoint(true)
    }

  /** Undirected simple edges (u, v), u < v — loops dropped, parallel
    * edges collapsed: THE distinct shuffle of the family, run once per
    * (corpus, fingerprint) instead of once per operator. */
  private[graft] def stagedSimpleEdges(s: SparkSession, dir: String): DataFrame =
    graft.StagedArtifacts.stage(s, s"graph/simpleEdges#$dir", docFp(s, dir)) {
      stagedCitation(s, dir)
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
        .localCheckpoint(true)
    }

  /** Symmetric adjacency (node, nb) — both directions of the simple-edge
    * rung, the frame every BFS-family loop joins per round. */
  private[graft] def stagedAdjacency(s: SparkSession, dir: String): DataFrame =
    graft.StagedArtifacts.stage(s, s"graph/adjacency#$dir", docFp(s, dir)) {
      val se = stagedSimpleEdges(s, dir)
      se.select(col("u").as("node"), col("v").as("nb"))
        .unionByName(se.select(col("v").as("node"), col("u").as("nb")))
        .localCheckpoint(true)
    }

  /** Directed simple edges (u, v) — loops dropped, distinct; the graph
    * `graph_scc` / `graph_reciprocity` analyze. */
  private[graft] def stagedDirectedSimple(s: SparkSession, dir: String): DataFrame =
    graft.StagedArtifacts.stage(s, s"graph/directedSimple#$dir", docFp(s, dir)) {
      stagedCitation(s, dir)
        .filter(col("src") =!= col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
        .distinct()
        .localCheckpoint(true)
    }
}
