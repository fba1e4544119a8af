"""Oracle output-type lint — the permanent fix for the HUGEINT class.

The driver fetches DuckDB oracle results via pandas ``fetchdf``, which
widens HUGEINT (DuckDB's type for an uncast integer ``SUM``) and
DECIMAL to float64.  Spark emits int64 for the same aggregate, so the
driver's value hash sees ``6.0`` vs ``6`` → hash mismatch with rows and
schema green.  That exact signature shipped red for three rounds
(``embedding_knn_classify{,_total}``, ``user_survival_curve``,
``trade_graph_pagerank`` — see VERDICT.md r7 "What's wrong" #1) before
the all-integer PageRank going red disproved the float-nondeterminism
theory and exposed the type-widening root cause.

This test DESCRIBEs every registered oracle against the sf0.001 views
and asserts every output column's DuckDB type is in the fetchdf-stable
allowlist.  HUGEINT and DECIMAL are forbidden: any integer SUM (plain,
windowed, or arithmetic over one) must be ``CAST(... AS BIGINT)`` in
the oracle (the Spark side is LongType already, so the cast keeps the
two sides' fetch classes identical).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from teleco_etl_pipeline_spark.plans.registry import all_queries
from teleco_etl_pipeline_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Types whose pandas fetchdf dtype hashes identically to the Spark
# collect() value class: int64/int32 ints, float64 doubles, object
# strings, bool, datetime64.  HUGEINT/UHUGEINT/UBIGINT/DECIMAL/FLOAT
# are deliberately absent — fetchdf widens or narrows them into a
# different value class than Spark's.
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield c
    c.close()


def _oracles():
    return sorted(
        (name, q.oracle) for name, q in all_queries().items() if q.oracle is not None
    )


def test_registry_has_oracles():
    assert len(_oracles()) >= 160


@pytest.mark.parametrize("name,oracle", _oracles(), ids=lambda v: v if isinstance(v, str) and "\n" not in v else "")
def test_oracle_output_types_are_fetchdf_stable(con, name, oracle):
    desc = con.execute(f"DESCRIBE {oracle}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if typ.split("(")[0].upper() not in ALLOWED
    ]
    assert not bad, (
        f"{name}: oracle output columns {bad} are outside the fetchdf-stable "
        f"allowlist {sorted(ALLOWED)} — an uncast integer SUM types HUGEINT "
        f"and the driver widens it to float64, hash-mismatching Spark's "
        f"int64. CAST the column (AS BIGINT / AS DOUBLE) in the oracle SQL."
    )


def test_parity_canon_distinguishes_widened_ints():
    """The local harness must reproduce the driver: fetchdf widens a
    HUGEINT SUM to float64, and the driver hashes 6.0 != 6.  The old
    _canon folded integral doubles back to int, which hid the red
    class for three rounds (check_parity.py round-8 docstring)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from check_parity import _canon

    assert _canon(6.0) != _canon(6)
    assert _canon(6) == 6
    assert _canon(float("nan")) == "NaN"
    # and the widened value is what an uncast DuckDB SUM actually fetches
    import duckdb

    df = duckdb.connect().execute(
        "SELECT SUM(x) AS s, CAST(SUM(x) AS BIGINT) AS sb FROM (VALUES (2),(4)) t(x)"
    ).fetchdf()
    assert str(df["s"].dtype) == "float64"  # HUGEINT -> float64 widening
    assert str(df["sb"].dtype) == "int64"
    assert _canon(df["s"][0]) != _canon(df["sb"][0])
