"""Round-8 second sketch batch: AMS join-size sketch, histogram
quantile sketch, FK-integrity profile — pure-Python twins and the
estimators' guarantees."""

from __future__ import annotations

import hashlib
import math
import os
from collections import defaultdict

import pytest

from teleco_etl_pipeline_spark.operators.profile import (
    _FK_EDGES,
    q_fk_integrity_report,
)
from teleco_etl_pipeline_spark.operators.sketch import (
    _AMS_D,
    _HQ_BINS,
    q_ams_join_size_estimate,
    q_histogram_quantile_sketch,
)


def _needs_data(sf_dir):
    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        pytest.skip("harness testdata absent")


def _sign(k, i) -> int:
    h = hashlib.md5(f"{k}ams{i}".encode()).hexdigest()
    return 1 - 2 * (int(h[0], 16) % 2)


def test_ams_matches_pure_python_and_bounds(spark, sf_dir):
    _needs_data(sf_dir)
    rows = {r["kind"]: r for r in q_ams_join_size_estimate(spark, sf_dir).collect()}
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).collect()
    oo = [
        r
        for r in spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).collect()
        if r["o_orderstatus"] == "F"
    ]
    fp, fl, fo = defaultdict(int), defaultdict(int), defaultdict(int)
    for r in li:
        fp[r["l_partkey"]] += 1
        fl[r["l_orderkey"]] += 1
    for r in oo:
        fo[r["o_orderkey"]] += 1

    f2_exact = sum(c * c for c in fp.values())
    xs = [sum(c * _sign(k, i) for k, c in fp.items()) for i in range(_AMS_D)]
    acc = sum(x * x for x in xs)
    row = rows["f2_partkey_selfjoin"]
    assert row["sketch_acc"] == acc
    assert row["estimate"] == acc / _AMS_D  # one CR divide: exact
    assert row["exact_size"] == f2_exact

    js_exact = sum(fl[k] * fo[k] for k in fl.keys() & fo.keys())
    xa = [sum(c * _sign(k, i) for k, c in fl.items()) for i in range(_AMS_D)]
    xb = [sum(c * _sign(k, i) for k, c in fo.items()) for i in range(_AMS_D)]
    dot = sum(a * b for a, b in zip(xa, xb))
    row = rows["joinsize_lineitem_orders_F"]
    assert row["sketch_acc"] == dot
    assert row["exact_size"] == js_exact
    # AMS guarantee: stderr of the mean-of-d estimator is
    # sqrt(Var/d) <= sqrt(2)*F2_A^0.5*F2_B^0.5/sqrt(d) (loose form);
    # assert within 6 sigma of the exact join size.
    f2a = sum(c * c for c in fl.values())
    f2b = sum(c * c for c in fo.values())
    sigma = math.sqrt(2.0 * f2a * f2b / _AMS_D)
    assert abs(row["estimate"] - js_exact) <= 6 * sigma


def test_histogram_quantile_matches_pure_python(spark, sf_dir):
    _needs_data(sf_dir)
    got = {r["label"]: r for r in q_histogram_quantile_sketch(spark, sf_dir).collect()}
    xs = [
        r["l_extendedprice"]
        for r in spark.read.parquet(
            os.path.join(sf_dir, "lineitem.parquet")
        ).collect()
    ]
    lo, hi, n = min(xs), max(xs), len(xs)
    cells = defaultdict(int)
    for x in xs:
        cells[min(int((x - lo) * _HQ_BINS / (hi - lo)), _HQ_BINS - 1)] += 1
    xs_sorted = sorted(xs)
    for label, qn, qd in [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]:
        target = -(-n * qn // qd)  # ceil
        cum = 0
        for b in sorted(cells):
            if cum + cells[b] >= target:
                break
            cum += cells[b]
        row = got[label]
        assert row["target_rank"] == target
        assert row["bin"] == b
        assert row["bin_count"] == cells[b]
        est = lo + (b + (target - cum) / cells[b]) * ((hi - lo) / _HQ_BINS)
        assert row["q_estimate"] == pytest.approx(est, rel=0, abs=1e-9)
        # the histogram guarantee: estimate within one bin width of
        # the exact order statistic at that rank
        exact_at_rank = xs_sorted[target - 1]
        assert abs(row["q_estimate"] - exact_at_rank) <= (hi - lo) / _HQ_BINS + 1e-9


def test_fk_integrity_clean_star_schema(spark, sf_dir):
    _needs_data(sf_dir)
    rows = q_fk_integrity_report(spark, sf_dir).collect()
    assert len(rows) == len(_FK_EDGES)
    # driver-generated star schema is referentially intact
    for r in rows:
        assert r["n_null_fk"] == 0 and r["n_orphans"] == 0
        assert r["n_child_rows"] > 0


def test_fk_integrity_detects_orphans(spark):
    from teleco_etl_pipeline_spark.operators.profile import fk_edge_report

    # crafted child: one valid FK, one orphan (99), one NULL
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (10,)], "pk int")  # dup parent keys
    row = fk_edge_report(child, "fk", parent, "pk", "child.fk -> parent.pk").collect()[0]
    assert row["fk_edge"] == "child.fk -> parent.pk"
    # the distinct() on parent keys keeps the dup from double-counting
    assert (row["n_child_rows"], row["n_null_fk"], row["n_orphans"]) == (3, 1, 1)
