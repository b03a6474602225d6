package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries.cosineSql
import graft.functions.HashExprs

/** #25k `ann_recall_eval` — recall@k of the approximate ANN variants
  * against the exact brute-force ground truth, per query: THE evaluation
  * every ANN deployment runs before trusting an index (Faiss/ScaNN ship
  * it as a first-class tool). For each of the shared query set, recall =
  * |approx-top-k ∩ exact-top-k| / k for `ann_ivf` (inverted-file, probe 4
  * of √n cells) and `ann_lsh_bucketed` (hyperplane bands) — the two
  * scale-path families whose recall/latency trade drives index choice.
  *
  * Everything is deterministic (the fixed query set, the deterministic
  * centroid/band chains, exact-cosine reranks with id tie-breaks), so the
  * recall numbers are FULLY oracle-checked — the DuckDB twin replays both
  * approximate chains AND the exact ranking, then intersects, which also
  * re-proves the underlying variants agree across engines. k is reported
  * per query (=|exact top-k|, 10 on any corpus of ≥11 vectors) so the
  * ratio is well-defined on degenerate corpora.
  *
  * Scale: the three sub-pipelines inherit their own operators' posture
  * (map-side chains, broadcast query sides); the intersection is a
  * left-semi join on (q_id, n_id) — |queries|·k rows — and the readout a
  * |queries|-row aggregate. Evaluation adds nothing super-linear. */
object RecallEval {

  def recallEval(s: SparkSession, dir: String): DataFrame = {
    val exact = graft.CacheRegistry.track(
      SimQueries.annTopkBrute(s, dir).select(col("q_id"), col("n_id")))
    val kPerQ = exact.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
    def recallOf(method: String, appr: DataFrame): DataFrame = {
      // both sides are |queries|·k rows (the eval set is bounded by
      // design) — broadcast them so the intersection never sort-merges
      val hits = exact
        .join(broadcast(appr.select(col("q_id"), col("n_id"))),
          Seq("q_id", "n_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
      kPerQ.join(broadcast(hits), Seq("q_id"), "left")
        .select(lit(method).as("method"), col("q_id"), col("k"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall",
          round(col("n_hit").cast("double") / col("k"), 4))
    }
    val ivf = recallOf("ivf", AnnIvf.annTopkIvf(s, dir))
    val lsh = recallOf("lsh", AnnLsh.queries("ann_lsh_bucketed")(s, dir))
    ivf.unionByName(lsh).orderBy(col("method"), col("q_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_eval" -> (recallEval _))

  val oracles: Map[String, String] = Map(
    "ann_recall_eval" -> {
      val cellsSql = "(SELECT greatest(16, ceil(sqrt(count(*) / 2.0))::BIGINT) FROM e)"
      s"""WITH ${HashExprs.hyperplaneChainSql},
         |lq AS (SELECT vec_id AS q_id, band, bkey FROM bd WHERE vec_id < 10),
         |lcand AS (SELECT DISTINCT lq.q_id, c.vec_id AS n_id
         | FROM bd c JOIN lq ON c.band = lq.band AND c.bkey = lq.bkey AND lq.q_id != c.vec_id),
         |lsc AS (SELECT q_id, n_id,
         |  round(${cosineSql("qe.emb", "ne.emb")}, 4) AS cosine
         | FROM lcand JOIN e qe ON qe.vec_id = lcand.q_id JOIN e ne ON ne.vec_id = lcand.n_id),
         |lrk AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
         | FROM lsc) t WHERE rank <= 10),
         |cents AS MATERIALIZED (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < $cellsSql),
         |assigned AS MATERIALIZED (
         | SELECT vec_id, emb, c_id AS cell FROM (
         |  SELECT e.vec_id, e.emb, cents.c_id,
         |   row_number() OVER (PARTITION BY e.vec_id
         |     ORDER BY round(${cosineSql("e.emb", "cents.c_emb")}, 6) DESC, cents.c_id) AS r
         |  FROM e CROSS JOIN cents) t
         | WHERE r = 1),
         |probes AS MATERIALIZED (
         | SELECT q_id, q_emb, c_id AS cell FROM (
         |  SELECT e.vec_id AS q_id, e.emb AS q_emb, cents.c_id,
         |   row_number() OVER (PARTITION BY e.vec_id
         |     ORDER BY round(${cosineSql("e.emb", "cents.c_emb")}, 6) DESC, cents.c_id) AS r
         |  FROM e CROSS JOIN cents WHERE e.vec_id < 10) t
         | WHERE r <= ${AnnIvf.NProbe}),
         |icand AS (
         | SELECT DISTINCT probes.q_id, assigned.vec_id AS n_id,
         |  round(${cosineSql("probes.q_emb", "assigned.emb")}, 4) AS cosine
         | FROM assigned JOIN probes ON assigned.cell = probes.cell
         | WHERE probes.q_id != assigned.vec_id),
         |irk AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
         | FROM icand) t WHERE rank <= ${AnnIvf.TopK}),
         |bsc AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |  round(${cosineSql("q.emb", "c.emb")}, 4) AS cosine
         | FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id != c.vec_id),
         |brk AS MATERIALIZED (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
         | FROM bsc) t WHERE rank <= 10),
         |kq AS (SELECT q_id, count(*)::BIGINT AS k FROM brk GROUP BY q_id),
         |ihit AS (SELECT b.q_id, count(*)::BIGINT AS n_hit
         | FROM brk b JOIN irk i ON b.q_id = i.q_id AND b.n_id = i.n_id GROUP BY b.q_id),
         |lhit AS (SELECT b.q_id, count(*)::BIGINT AS n_hit
         | FROM brk b JOIN lrk l ON b.q_id = l.q_id AND b.n_id = l.n_id GROUP BY b.q_id)
         |SELECT 'ivf' AS method, kq.q_id, kq.k, coalesce(ihit.n_hit, 0)::BIGINT AS n_hit,
         | round(coalesce(ihit.n_hit, 0) / kq.k::DOUBLE, 4) AS recall
         |FROM kq LEFT JOIN ihit USING (q_id)
         |UNION ALL
         |SELECT 'lsh', kq.q_id, kq.k, coalesce(lhit.n_hit, 0)::BIGINT,
         | round(coalesce(lhit.n_hit, 0) / kq.k::DOUBLE, 4)
         |FROM kq LEFT JOIN lhit USING (q_id)
         |ORDER BY method, q_id""".stripMargin
    })
}
