"""One-pass table profiling: per-column null/distinct/min/max.

The DQ-platform staple (what every ingestion UI shows next to a
landed table) as ONE aggregate job: for N profiled columns the plan
is a single global aggregate emitting 4N measures, then a zero-
shuffle unpivot (Expand) to the long (column_name, stats) layout —
not N table scans. Complements the rule-driven DQ corpus
(`plans/dq_corpus.py`, reference `dags/SQL/DWH_Quality_Checks.sql`):
rules assert known invariants, the profile SURFACES the unknowns
(cardinality drift, new null pockets, range creep) that tell you
which rule to write next.

Scale (100 TB): the aggregate is map-side combined; the multiple
COUNT(DISTINCT …) expand multiplies map rows by N but each expanded
row is one column's value — shuffle is N × per-column-distinct
partials, still far below the data. For trillion-row profiling swap
COUNT(DISTINCT) for approx_count_distinct (HLL++) per column — same
plan shape, bounded shuffle; the exact form here is what the oracle
can check (deterministic sketch twin: `hll_sketch_estimate`).

Determinism: min/max are computed in the column's NATIVE type (so
string columns compare lexicographically, ints numerically) and cast
to string only for the report. Only integer / string / date columns
are profiled in the registered query — float min/max→string
formatting is engine-specific ('1.5E7' vs '15000000.0'), exactly
the widening class tests/test_oracle_types.py exists to keep out of
hashed outputs. The operator itself accepts any column list.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table


def table_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column_name, n_rows, n_null, n_distinct, min_value, max_value)
    — one aggregate pass, one Expand unpivot, no per-column scans."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        "__n_rows AS n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(column_name, n_null, n_distinct, min_value, max_value)",
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_oracle(cols: Sequence[str]) -> str:
    branches = "\n    UNION ALL ".join(
        f"""SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM orders"""
        for c in cols
    )
    return branches + "\n    ORDER BY column_name"


@query(
    "orders_column_profile",
    _profile_oracle(_PROFILE_COLS),
    doc="One-pass column profiler over orders (null count, exact "
    "distinct cardinality, native-typed min/max) unpivoted to the "
    "long report layout — single aggregate + Expand, not N scans "
    "(the oracle's UNION-ALL-per-column form IS the naive plan this "
    "operator replaces). approx_count_distinct is the documented "
    "trillion-row swap. Feeds rule discovery for the DQ corpus.",
)
def q_orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return table_profile(o, _PROFILE_COLS).orderBy("column_name")
