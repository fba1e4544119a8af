"""Skip-gram pair counts (operators/freq.py), quantile normalization
and mutual-information contributions (plans/stats.py)."""

from __future__ import annotations

import math

from teleco_etl_pipeline_spark.operators.freq import token_skipgram_counts
from teleco_etl_pipeline_spark.plans.registry import all_queries


def test_skipgram_window_semantics(spark):
    # "a b c d": d=1 pairs (a,b)(b,c)(c,d); d=2 pairs (a,c)(b,d).
    df = spark.createDataFrame([("a b c d",)], ["text"])
    got = {
        (r.w1, r.w2): r.cnt
        for r in token_skipgram_counts(df, window=2, top_n=100).collect()
    }
    assert got == {
        ("a", "b"): 1,
        ("b", "c"): 1,
        ("c", "d"): 1,
        ("a", "c"): 1,
        ("b", "d"): 1,
    }


def test_skipgram_short_docs(spark):
    # 1-token doc contributes nothing; 2-token doc only the d=1 pair.
    df = spark.createDataFrame([("solo",), ("x y",)], ["text"])
    got = {
        (r.w1, r.w2)
        for r in token_skipgram_counts(df, window=2, top_n=100).collect()
    }
    assert got == {("x", "y")}


def test_skipgram_counts_aggregate_across_docs(spark):
    df = spark.createDataFrame([("a b",), ("a b",), ("b a",)], ["text"])
    got = {
        (r.w1, r.w2): r.cnt
        for r in token_skipgram_counts(df, window=1, top_n=10).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_quantile_normalize_output_is_reference_distribution(spark, sf_dir):
    out = (
        all_queries()["acctbal_quantile_normalize"]
        .build(spark, sf_dir)
        .collect()
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    assert sum(r.n_customers for r in out) == cust.count()
    # normalized values are drawn FROM the supplier distribution:
    # global min/max of the mapped values live inside supplier range
    s_rows = supp.selectExpr(
        "CAST(ROUND(MIN(s_acctbal) * 100) AS BIGINT) AS lo",
        "CAST(ROUND(MAX(s_acctbal) * 100) AS BIGINT) AS hi",
    ).collect()[0]
    for r in out:
        assert s_rows.lo <= r.min_norm_cents <= r.max_norm_cents <= s_rows.hi
    # after normalization segments share the same reference scale, so
    # per-segment means are all near the global supplier mean
    means = [r.mean_norm for r in out]
    assert max(means) - min(means) < 0.25 * (abs(max(means)) + 100)


def test_quantile_normalize_rank_map_endpoints():
    # the integer rank map sends rank 1 -> position 1 and rank n ->
    # position m (endpoint-exact interpolation)
    def pos(rn, n, m):
        return ((rn - 1) * (m - 1)) // (n - 1) + 1

    assert pos(1, 1500, 100) == 1
    assert pos(1500, 1500, 100) == 100
    assert pos(750, 1500, 100) in (50, 51)


def test_mutual_info_independence_near_zero(spark, sf_dir):
    out = (
        all_queries()["priority_status_mutual_info"]
        .build(spark, sf_dir)
        .collect()
    )
    # synthetic priority and status are generated independently: the
    # total MI (sum of contributions) is tiny
    total = sum(r.mi_term for r in out)
    assert abs(total) < 0.01
    # contributions are bounded by p * |ln p| <= 1/e ... ln bounds
    for r in out:
        assert abs(r.mi_term) < 1.0


def test_mutual_info_formula_on_dependent_table(spark):
    # fully dependent 2x2: MI = ln 2 split across two cells
    df = spark.createDataFrame(
        [("A", "x")] * 50 + [("B", "y")] * 50, ["o_orderpriority", "o_orderstatus"]
    )
    df.write.mode("overwrite").parquet("/tmp/__mi_orders/orders.parquet")
    out = (
        all_queries()["priority_status_mutual_info"]
        .build(spark, "/tmp/__mi_orders")
        .collect()
    )
    total = sum(r.mi_term for r in out)
    assert abs(total - math.log(2.0)) < 1e-4
