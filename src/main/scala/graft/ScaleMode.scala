package graft

import org.apache.spark.sql.SparkSession

/** The 100 TB scale switch (`spark.graft.scale.approx`).
  *
  * A handful of operators carry an EXACT tail — a corpus-cardinality global
  * rank, a per-group NTILE, an exact `percentile` buffer — because exactness
  * is what makes them deterministic and DuckDB-oracle-checkable at test
  * scale. Each documents its 100 TB swap; this conf makes the swap real
  * code instead of a comment: with `spark.graft.scale.approx=true` the same
  * entry point compiles the sketch/threshold form —
  *
  *  - `emb_outliers`: corpus-wide `Window.orderBy` rank → one mergeable
  *    `percentile_approx` threshold + distributed filter;
  *  - `sample_importance`: global top-quota rank → weight threshold from
  *    one sketch pass + range-partitioned distributed rank (no
  *    single-partition window anywhere);
  *  - `sample_balanced`: unbounded per-label rank → analytic uniform-hash
  *    pre-filter (md5 is uniform, so the keep-fraction IS the threshold)
  *    that bounds the per-label window to ~min_n rows;
  *  - `text_length_stats`: exact `percentile` (buffers every group value)
  *    → `percentile_approx` (bounded sketch, mergeable map-side);
  *  - `stats_equidepth`: per-type NTILE (full per-type sort) → bucket
  *    bounds from one `percentile_approx` array + map-side bucket
  *    assignment, no window at all;
  *  - `ts_rolling_quantile`: per-window exact rank selection →
  *    `percentile_approx` per trailing window;
  *  - `sample_kcenter`: K−1 sequential farthest-first corpus scans →
  *    doubling-batch rounds (⌈log₂K⌉ TakeOrdered scans, batch r picks the
  *    min(|centers|, K−|centers|) farthest points at once).
  *
  * Default off: the exact forms are the oracle-checked contract, and the
  * driver's correctness gate runs them. `ScaleModeSpec` pins, per operator:
  * (a) conf-off output is unchanged, (b) the conf-on physical plan drops
  * the partition-less window / global sort / exact-percentile buffer, and
  * (c) conf-on output differs from exact only at the selection boundary. */
object ScaleMode {

  val Key = "spark.graft.scale.approx"

  /** Accuracy for percentile_approx sketches: at 1/accuracy relative rank
    * error, 10k gives exact results on toy corpora (n < accuracy) and
    * ~0.01% rank error at 100 TB — well inside any selection boundary. */
  val SketchAccuracy = 10000

  def approx(s: SparkSession): Boolean =
    s.conf.getOption(Key).exists(_.toBoolean)
}
