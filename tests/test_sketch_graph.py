"""Deterministic sketches (operators/sketch.py) and the
co-fulfillment graph family (triangles / k-core peeling,
operators/graph.py) — each pinned against an independent pure-Python
implementation of the same recurrence, plus the distribution-free
properties the operators guarantee (HLL register mergeability, CMS
overestimate-only, acyclic-orientation triangle uniqueness,
monotone peeling)."""

from __future__ import annotations

import hashlib
import itertools
import os
from collections import defaultdict

import pytest

from teleco_etl_pipeline_spark.operators.sketch import (
    _CMS_D,
    _CMS_TOPK,
    _CMS_W,
    _HLL_C,
    _HLL_M,
    _HLL_R,
    q_cms_frequency_estimates,
    q_hll_sketch_estimate,
)
from teleco_etl_pipeline_spark.operators.graph import (
    _KCORE_ITERS,
    _KCORE_K,
    _MIN_CO,
    _TRI_TOPK,
    q_supplier_kcore_peel,
    q_supplier_triangle_count,
)


def _needs_data(sf_dir):
    if not os.path.exists(os.path.join(sf_dir, "orders.parquet")):
        pytest.skip("harness testdata absent")


# --- HLL -------------------------------------------------------------------


def _hll_registers(keys):
    """Pure-Python twin of the md5 register derivation."""
    regs = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket = int(h[:2], 16)
        tail = int(h[2:15], 16)
        rho = _HLL_R if tail == 0 else 52 - tail.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _hll_row(keys):
    regs = _hll_registers(keys)
    s = sum(1 << (_HLL_R - r) for r in regs.values())
    z_scaled = s + (_HLL_M - len(regs)) * (1 << _HLL_R)
    return {
        "n_zero_registers": _HLL_M - len(regs),
        "max_rho": max(regs.values()),
        "z_scaled": z_scaled,
        "raw_estimate": _HLL_C / float(z_scaled),
    }


def test_hll_matches_pure_python(spark, sf_dir):
    _needs_data(sf_dir)
    got = {r["grp"]: r.asDict() for r in q_hll_sketch_estimate(spark, sf_dir).collect()}
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderpriority", "o_custkey")
        .collect()
    )
    by_grp = defaultdict(list)
    for r in orders:
        by_grp[r["o_orderpriority"]].append(r["o_custkey"])
    assert set(got) == set(by_grp)
    for grp, keys in by_grp.items():
        want = _hll_row(keys)
        row = got[grp]
        assert row["n_zero_registers"] == want["n_zero_registers"]
        assert row["max_rho"] == want["max_rho"]
        assert row["z_scaled"] == want["z_scaled"]
        assert row["raw_estimate"] == want["raw_estimate"]  # CR divide: exact


def test_hll_accuracy_and_mergeability(spark, sf_dir):
    _needs_data(sf_dir)
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_custkey")
        .collect()
    )
    keys = [r["o_custkey"] for r in orders]
    exact = len(set(keys))
    row = _hll_row(keys)
    est = row["raw_estimate"]
    # Small-range regime (raw <= 2.5m with empty registers): apply the
    # standard linear-counting correction m*ln(m/V) CONSUMER-side from
    # the emitted n_zero_registers — the query itself stays ln-free
    # for cross-engine determinism (module docstring).
    import math

    if est <= 2.5 * _HLL_M and row["n_zero_registers"] > 0:
        est = _HLL_M * math.log(_HLL_M / row["n_zero_registers"])
    # m=256 -> relative error sigma ~= 1.04/sqrt(256) = 6.5%; allow 4 sigma.
    assert abs(est - exact) / exact < 0.26
    # Mergeability: registers of the union == per-bucket MAX of the
    # halves' registers — the property that lets per-partition
    # sketches combine without reshuffling raw values.
    half = len(keys) // 2
    left, right = _hll_registers(keys[:half]), _hll_registers(keys[half:])
    merged = {
        b: max(left.get(b, 0), right.get(b, 0)) for b in set(left) | set(right)
    }
    assert merged == _hll_registers(keys)


# --- CMS -------------------------------------------------------------------


def _cms_cells(counts):
    cells = defaultdict(int)
    for k, c in counts.items():
        for i in range(_CMS_D):
            h = hashlib.md5(f"{k}cm{i}".encode()).hexdigest()
            cells[(i, int(h[:8], 16) % _CMS_W)] += c
    return cells


def test_cms_matches_pure_python_and_overestimates(spark, sf_dir):
    _needs_data(sf_dir)
    got = q_cms_frequency_estimates(spark, sf_dir).collect()
    assert 0 < len(got) <= _CMS_TOPK
    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_partkey")
        .collect()
    )
    counts = defaultdict(int)
    for r in li:
        counts[r["l_partkey"]] += 1
    cells = _cms_cells(counts)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: _CMS_TOPK]
    want = {}
    for k, c in top:
        est = min(
            cells[
                (
                    i,
                    int(hashlib.md5(f"{k}cm{i}".encode()).hexdigest()[:8], 16)
                    % _CMS_W,
                )
            ]
            for i in range(_CMS_D)
        )
        want[k] = (c, est)
    assert {r["l_partkey"]: (r["exact_cnt"], r["cms_estimate"]) for r in got} == want
    for r in got:  # the count-min guarantee: never an underestimate
        assert r["cms_estimate"] >= r["exact_cnt"]


# --- co-fulfillment graph ---------------------------------------------------


def _edges(spark, sf_dir):
    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_suppkey"])
    co = defaultdict(int)
    for supps in by_order.values():
        for u, v in itertools.combinations(sorted(supps), 2):
            co[(u, v)] += 1
    return {e for e, n in co.items() if n >= _MIN_CO}


def test_triangle_count_matches_pure_python(spark, sf_dir):
    _needs_data(sf_dir)
    edges = _edges(spark, sf_dir)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    per_node = defaultdict(int)
    seen = set()
    for u, v in edges:
        for w in adj[u] & adj[v]:
            tri = tuple(sorted((u, v, w)))
            if tri not in seen:
                seen.add(tri)
                for x in tri:
                    per_node[x] += 1
    want = sorted(per_node.items(), key=lambda kv: (-kv[1], kv[0]))[: _TRI_TOPK]
    got = [
        (r["s_suppkey"], r["n_triangles"])
        for r in q_supplier_triangle_count(spark, sf_dir).collect()
    ]
    assert got == want


def test_kcore_peel_matches_pure_python(spark, sf_dir):
    _needs_data(sf_dir)
    edges = _edges(spark, sf_dir)
    rows = q_supplier_kcore_peel(spark, sf_dir).collect()
    assert [r["iter"] for r in rows] == list(range(1, _KCORE_ITERS + 1))
    cur = set(edges)
    for row in rows:
        deg = defaultdict(int)
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= _KCORE_K}
        cur = {(u, v) for u, v in cur if u in keep and v in keep}
        assert row["n_nodes"] == len(keep)
        assert row["n_edges"] == len(cur)
    # peeling is monotone: node/edge counts never increase
    ns = [r["n_nodes"] for r in rows]
    es = [r["n_edges"] for r in rows]
    assert ns == sorted(ns, reverse=True) and es == sorted(es, reverse=True)
