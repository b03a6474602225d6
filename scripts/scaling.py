#!/usr/bin/env python3
"""Scaling-exponent analysis for SCALING.md: reads three Bench records
(sf0.01 / sf0.1 / sf1) produced with SPARK_GRAFT_BENCH_OUT and fits
per-operator time-vs-input-rows exponents.

Usage: scaling.py <sf001.json> <sf01.json> <sf1.json>

Prints the SCALING.md operator table to stdout. The "exp (last decade)"
column is log10(t_sf1 / t_sf0.1) — the informative number at this scale,
where the sf0.01 point sits on Spark's per-stage scheduling floor; the
full least-squares fit over all three points is shown for reference and
is biased DOWN by that floor."""
import json
import math
import sys

ROWS = {
    "documents": {0: 500, 1: 5000, 2: 50000},
    "embeddings": {0: 500, 1: 2000, 2: 20000},
    "events": {0: 10000, 1: 100000, 2: 1000000},
}

TABLE_OF = {}
for op in ("dedup_exact dedup_ngram_jaccard dedup_edit_distance dedup_containment "
           "dedup_minhash_lsh dedup_clusters dedup_weights dedup_rewrite "
           "dedup_rewrite_exact dedup_simhash text_pipeline_report "
           "text_quality_classifier graph_pagerank graph_components graph_kcore "
           "graph_labelprop graph_triangles graph_bfs graph_scc "
           # round-12 additions: the scale study is a living instrument —
           # corpus-heavy operators join the measurement set the round they land
           "text_kn_score text_ngram_novelty text_perplexity_buckets "
           "text_pii_scrub graph_closeness graph_reciprocity "
           "mm_keyframe_select "
           # round-14 additions
           "graph_louvain text_tokenizer_fertility text_lm_score").split():
    TABLE_OF[op] = "documents"
for op in ("ann_topk_brute ann_lsh_bucketed ann_multiprobe ann_ivf ann_pq "
           "ann_ivfpq ann_hamming_rerank ann_range_search emb_kmeans "
           "dedup_semantic dedup_embedding_cosine dedup_embedding_lsh "
           # round-14 additions
           "ann_knn_graph").split():
    TABLE_OF[op] = "embeddings"
for op in ("etl_geo_cluster stats_bootstrap "
           "ts_periodogram ts_holtwinters stats_linreg "
           # round-14 additions
           "stream_late_data").split():
    TABLE_OF[op] = "events"


def fit(xs, ys):
    lx = [math.log10(x) for x in xs]
    ly = [math.log10(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den


def main():
    recs = [json.load(open(p))["queries"] for p in sys.argv[1:4]]
    rows_out = []
    for op in sorted(TABLE_OF):
        t = [recs[i].get(op) for i in range(3)]
        if any(v is None or v <= 0 for v in t):
            continue
        tbl = TABLE_OF[op]
        r = [ROWS[tbl][i] for i in range(3)]
        e_last = math.log10(t[2] / t[1]) / math.log10(r[2] / r[1])
        e_fit = fit(r, t)
        if e_last <= 1.2:
            verdict = "OK"
        elif t[2] < 2.0:
            verdict = "floor-noise (sub-2s)"
        else:
            verdict = "INVESTIGATE"
        rows_out.append((op, tbl, r, t, e_last, e_fit, verdict))
    print("| operator | input | rows ×10² | t(sf0.01) | t(sf0.1) | t(sf1) | exp (last decade) | exp (3-pt fit) | verdict |")
    print("|---|---|---|---|---|---|---|---|---|")
    for op, tbl, r, t, e_last, e_fit, verdict in rows_out:
        print(f"| `{op}` | {tbl} | {r[0]}→{r[1]}→{r[2]} | {t[0]:.2f} s | "
              f"{t[1]:.2f} s | {t[2]:.2f} s | **{e_last:.2f}** | {e_fit:.2f} | {verdict} |")
    bad = [x for x in rows_out if x[6] == "INVESTIGATE"]
    print(f"\n{len(rows_out)} operators measured; "
          f"{sum(1 for x in rows_out if x[4] <= 1.2)} at exponent ≤ 1.2 "
          f"over the last decade; {len(bad)} flagged INVESTIGATE.")
    for x in bad:
        print(f"  - {x[0]}: exp {x[4]:.2f}, t(sf1) {x[3][2]:.2f}s")


if __name__ == "__main__":
    main()
