"""Driver-contract smoke tests: entry/queries/oracle_sql shape."""

from __future__ import annotations

import importlib.util
import os


def _load_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_consistent(spark, sf_dir):
    mod = _load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every oracle-less query is one of the declared sketch ops
    # The only queries without oracles are the two true sketches
    # (HLL / KLL): their outputs are estimator-internal and not
    # reproducible in DuckDB; both have exact oracle-backed twins.
    assert set(qs) - set(oracles) == {
        "approx_distinct_users",
        "approx_quantile_profile",
    }


def test_every_query_builds_valid_plan(spark, sf_dir):
    mod = _load_entry()
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        df.explain()  # analysis succeeds
        assert df.columns, name


def test_bench_queries_all_registered():
    """bench.py must never KeyError at driver time (the round-3
    failure mode was a bench crash): every headline name resolves in
    the registry."""
    import importlib.util

    from teleco_etl_pipeline_spark.plans.registry import all_queries

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.BENCH_QUERIES if n not in all_queries()]
    assert not missing, missing
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_record_window_is_exact_and_disjoint():
    """The 50-slot recording window must stay exactly 50 (the driver
    records the first 50 of queries() order), disjoint from the
    past-window list, with no typo'd names in either."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    mod = _load_entry()
    order, last = mod._RECORD_ORDER, mod._RECORD_LAST
    reg = set(all_queries())
    assert len(order) == 50 and len(set(order)) == 50
    assert not set(order) & set(last)
    assert set(order) <= reg and set(last) <= reg
    # queries() must lead with exactly the window
    assert list(mod.queries())[:50] == order
