"""Scaling-curve evidence: time the baseline-vs-scale-path pairs at
two data scales (sf0.01 → sf0.1, a 10× step) and report per-query
growth ratios.

Why this exists: BENCH_r{N}.json shows absolute speed at one SF; the
100 TB claim is about GROWTH. A correct scale path grows ~linearly
with the data (ratio ≈ 10 minus fixed overhead amortization), while
the all-pairs baselines it replaces grow ~quadratically (ratio ≈ 100).
This harness measures that contrast instead of asserting it.

Pairs measured (baseline → scale path):
  - embedding_neardup (exact all-pairs O(N²))
      → embedding_lsh_pairs / embedding_lsh_multiprobe (bucketed)
  - ngram_jaccard_pairs (unguarded shingle self-join)
      → ngram_jaccard_guarded (frequency-guarded)
      → minhash_lsh_pairs (banded sketch)
  - embedding_topk (exact scan) → embedding_pq_topk (ADC codes)
  - pricing_summary / exact_dedup: linear references for calibration

Usage: python scripts/bench_scaling.py [--json OUT]
Prints one JSON line {"metric": "scaling_10x_growth", "queries":
{name: {"sec_sf0.01": s, "sec_sf0.1": s, "growth_10x_data": r}}}.
Run it uncontended — ratios are wall-clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from teleco_etl_pipeline_spark.plans.registry import all_queries
from teleco_etl_pipeline_spark.session import get_spark

SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

QUERIES = [
    # linear references
    "pricing_summary",
    "exact_dedup",
    # ANN family: baseline then scale paths
    "embedding_neardup",
    "embedding_lsh_pairs",
    "embedding_lsh_multiprobe",
    "embedding_topk",
    "embedding_pq_topk",
    # text near-dup family
    "ngram_jaccard_pairs",
    "ngram_jaccard_guarded",
    "minhash_lsh_pairs",
    # cross-doc scrub (gram-count shuffle growth)
    "doc_frequent_ngram_scrub",
    # linear decontamination (train-set hash join, no self-join)
    "contamination_ngram_overlap",
    # retrieval compositions (bucket-bounded candidates / bounded lists)
    "embedding_knn_classify",
    "embedding_batch_topk",
    "doc_hybrid_rrf",
    # composed IVFADC (probed code-table scan — the flattest ANN curve)
    "embedding_ivfpq_topk",
    # exact trailing-window distinct (explode factor constant in data)
    "events_active_users_7d",
    # pigeonhole segment-blocked ER (candidates track dup density, not
    # volume — the attribute-blocked form grew ~10x per 10x data)
    "customer_linkage_blocked",
    # -- round-7 additions --------------------------------------------
    # exact PPJoin set-similarity (prefix-filtered + clique-collapsed;
    # the EXACT third dedup path — growth tracks near-dup density)
    "token_jaccard_prefix_pairs",
    # inverted-index lexical retrieval (query-token postings only)
    "doc_sparse_tfidf_topk",
    # total-coverage kNN (leftover fallback is a bounded broadcast)
    "embedding_knn_classify_total",
    # footer-only zone-map manifest (grows with row groups, not rows)
    "lineitem_zonemap_report",
    # -- round-8 additions --------------------------------------------
    # deterministic sketches: work ∝ data for the hash pass, shuffle
    # bounded by sketch size (registers / cells / k-minima)
    "hll_sketch_estimate",
    "cms_frequency_estimates",
    "kmv_set_cardinality",
    # graph family: basket-bounded edge build + wedge join (triangles)
    # / peel rounds (k-core) — growth tracks edge count, thresholded
    "supplier_triangle_count",
    "supplier_kcore_peel",
    # iterative PageRank (3 unrolled edge-join rounds)
    "trade_graph_pagerank",
    # CDC hash-diff (one fingerprint shuffle, ~40 B/row)
    "orders_snapshot_diff",
    # one-pass profiler (multi-distinct Expand ∝ N·cols)
    "orders_column_profile",
    # BPE trainer (vocab-sized recurrence after one token-count pass)
    "bpe_learn_merges",
    # manifest-pruned selective scan (files read, not rows)
    "lineitem_pruned_window",
    # rank statistics: global/per-group sort windows (ORDER BY class)
    "mannwhitney_priority",
    "segment_gini_spend",
    "ks_priority_totalprice",
    # incremental MV refresh: cost ∝ churn (fingerprint shuffle) not size
    "priority_view_refresh",
    # day/month-grain screens: fact scan dominates, windows are trivia
    "daily_revenue_acf",
    "part_price_skyline",
    # -- round-8 second-session additions ------------------------------
    # winnowing: hash pass ∝ tokens, fp self-join bounded by the
    # stop-fingerprint guard (the fourth dedup path)
    "winnowing_fingerprint_pairs",
    "contamination_winnowing",
    # Poisson bootstrap: map rows ×B/4 digests, shuffle = B partials
    "poisson_bootstrap_ci",
    # k-center: k broadcast passes over N rows (k fixed)
    "embedding_kcenter_coreset",
    # HITS: two edge-join supersteps, same class as pagerank
    "trade_graph_hits",
    # drift screens: one fact aggregate + bounded cell/bin frames
    "totalprice_psi_drift",
    "split_token_jsd",
    # global rank maps / sorts (ORDER BY class)
    "acctbal_quantile_normalize",
    "lineitem_spearman_matrix",
    # broadcast-histogram scoring + TakeOrdered
    "orders_hbos_outliers",
]


def main() -> None:
    json_out = None
    argv = sys.argv[1:]
    if argv and argv[0] == "--json":
        if len(argv) < 2:
            raise SystemExit("usage: bench_scaling.py [--json OUT]")
        json_out = argv[1]
        argv = argv[2:]
    if argv:
        raise SystemExit(f"unexpected arguments: {argv} (usage: bench_scaling.py [--json OUT])")
    spark = get_spark(app_name="bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    registry["distinct_values"].build(spark, SF_DIRS[0]).count()  # warm-up

    # Time build() + action TOGETHER (bench.py's convention): the
    # iterative operators (PageRank/HITS/k-core/k-center/BFS)
    # materialize their supersteps with EAGER localCheckpoint inside
    # build(), so an action-only timer would miss almost all of their
    # work and report flat ~25 ms growth curves for the very
    # operators whose growth this harness exists to measure.
    results: dict[str, dict] = {}
    for name in QUERIES:
        per_sf: list[float] = []
        for sf_dir in SF_DIRS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = registry[name].build(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            per_sf.append(round(best, 3))
        ratio = round(per_sf[1] / per_sf[0], 2) if per_sf[0] > 0 else None
        results[name] = {
            "sec_sf0.01": per_sf[0],
            "sec_sf0.1": per_sf[1],
            "growth_10x_data": ratio,
        }
        # Several operators cache shared leaves (gram/shingle
        # explodes, minhash signatures); drop them so one query's
        # resident cache never skews a later query's timed region.
        spark.catalog.clearCache()

    out = {"metric": "scaling_10x_growth", "queries": results}
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
