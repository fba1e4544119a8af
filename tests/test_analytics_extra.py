"""Tolerance checks for sketch-based scale twins of exact queries."""

from __future__ import annotations

from teleco_etl_pipeline_spark.plans.registry import all_queries


def test_lsh_pairs_subset_of_exact_neardups(spark, sf_dir):
    """Sign-LSH candidates are exact-cosine-verified, so every emitted
    pair must appear in the all-pairs exact twin (recall < 1 is
    expected; precision must be 1)."""
    qs = all_queries()
    exact = {
        (r["id_a"], r["id_b"])
        for r in qs["embedding_neardup"].build(spark, sf_dir).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in qs["embedding_lsh_pairs"].build(spark, sf_dir).collect()
    }
    assert lsh <= exact


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    qs = all_queries()
    exact = {
        r["l_returnflag"]: r
        for r in qs["quantile_profile"].build(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in qs["approx_quantile_profile"].build(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("price_q1", "price_median", "price_q3"):
            # accuracy=10000 ⇒ rank error ≤ 1e-4; on lineitem prices
            # (~[900, 105k]) allow 1% relative value error.
            assert abs(a[col] - e[col]) <= 0.01 * abs(e[col]) + 1e-6, (
                flag,
                col,
                a[col],
                e[col],
            )
