"""CDC snapshot-diff (operators/cdc.py), one-pass column profiler
(operators/profile.py), and the KMV distinct sketch
(operators/sketch.py) — classification semantics on crafted frames,
brute-force agreement on testdata, and the estimator's accuracy
bound."""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict

import pytest

from teleco_etl_pipeline_spark.operators.cdc import snapshot_diff
from teleco_etl_pipeline_spark.operators.profile import table_profile
from teleco_etl_pipeline_spark.operators.sketch import (
    _KMV_BITS,
    _KMV_K,
    _KMV_NUM,
    q_kmv_set_cardinality,
)


def _needs_data(sf_dir):
    if not os.path.exists(os.path.join(sf_dir, "orders.parquet")):
        pytest.skip("harness testdata absent")


# --- snapshot_diff -----------------------------------------------------------


def test_snapshot_diff_classifies_all_three_classes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 value-changed, 3 gone, 5 added, 4 NULL→''
        [(1, "a", 10), (2, "B", 20), (5, "e", 50), (4, "", 40)],
        "k int, s string, v int",
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # NULL and '' must hash differently (sentinel, not dropped field)
    assert got == {2: "UPDATE", 3: "DELETE", 5: "INSERT", 4: "UPDATE"}


def test_snapshot_diff_is_empty_on_identical_snapshots(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    assert snapshot_diff(df, df, ["k"], ["s"]).count() == 0


# --- table_profile -----------------------------------------------------------


def test_table_profile_matches_brute_force(spark, sf_dir):
    _needs_data(sf_dir)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    got = {r["column_name"]: r for r in table_profile(o, cols).collect()}
    rows = o.select(cols).collect()
    for c in cols:
        vals = [r[c] for r in rows]
        nn = [v for v in vals if v is not None]
        assert got[c]["n_rows"] == len(vals)
        assert got[c]["n_null"] == len(vals) - len(nn)
        assert got[c]["n_distinct"] == len(set(nn))
        assert got[c]["min_value"] == str(min(nn))
        assert got[c]["max_value"] == str(max(nn))


def test_table_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None)], "k int, s string"
    )
    got = {r["column_name"]: r for r in table_profile(df, ["s"]).collect()}
    assert got["s"]["n_null"] == 2
    assert got["s"]["n_distinct"] == 1
    assert got["s"]["min_value"] == "x"


# --- KMV ---------------------------------------------------------------------


def _h52(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:13], 16)


def test_kmv_matches_pure_python_and_accuracy(spark, sf_dir):
    _needs_data(sf_dir)
    row = q_kmv_set_cardinality(spark, sf_dir).collect()[0]
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderstatus", "o_custkey")
        .collect()
    )
    by_status = defaultdict(set)
    for r in orders:
        by_status[r["o_orderstatus"]].add(r["o_custkey"])
    a = sorted(_h52(k) for k in by_status["F"])
    b = sorted(_h52(k) for k in by_status["O"])
    u = sorted(set(a) | set(b))
    assert row["kth_min_a"] == a[_KMV_K - 1]
    assert row["kth_min_b"] == b[_KMV_K - 1]
    assert row["kth_min_union"] == u[_KMV_K - 1]
    uk = set(u[:_KMV_K])
    assert row["n_in_both"] == len(uk & set(a) & set(b))
    assert row["est_a"] == _KMV_NUM / float(a[_KMV_K - 1])  # CR divide: exact
    # Estimator accuracy: sigma ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma.
    for est, exact in [
        (row["est_a"], row["exact_a"]),
        (row["est_b"], row["exact_b"]),
        (row["est_union"], row["exact_union"]),
    ]:
        assert abs(est - exact) / exact < 0.51
    assert row["exact_union"] == len(set(by_status["F"]) | set(by_status["O"]))
