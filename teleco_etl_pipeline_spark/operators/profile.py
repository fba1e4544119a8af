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
    # Single-file tables are one byte-split: without the repartition
    # the 4N-measure Expand + partial aggregate runs on one core
    # (2.2 s -> 1.1 s at sf0.1; the dedup._doc_shingles rationale).
    par = spark.sparkContext.defaultParallelism
    return table_profile(o.repartition(par), _PROFILE_COLS).orderBy(
        "column_name"
    )


# --- referential-integrity profile across the star schema -------------------

_FK_EDGES = [
    # (child, fk_col, parent, pk_col)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_oracle() -> str:
    branches = "\n    UNION ALL ".join(
        f"""SELECT '{c}.{fk} -> {p}.{pk}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(SUM(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_fk,
           CAST(SUM(CASE WHEN c.{fk} IS NOT NULL AND p.{pk} IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM {c} c LEFT JOIN (SELECT DISTINCT {pk} FROM {p}) p ON c.{fk} = p.{pk}"""
        for c, fk, p, pk in _FK_EDGES
    )
    return branches + "\n    ORDER BY fk_edge"


@query(
    "fk_integrity_report",
    _fk_oracle(),
    doc="Referential-integrity profile of the WHOLE star schema in "
    "one report: per declared FK edge, child rows / NULL FKs / "
    "orphans (FK set but no parent). Each edge is a broadcast left "
    "join against the DISTINCT parent keys — dims broadcast, the "
    "fact scans stay pruned to the key column, and the orphan test "
    "is the `anti_join` operator generalized to a schema-wide "
    "constraint-discovery sweep (the DQ-corpus rules assert known "
    "edges one at a time; this surfaces the whole map).",
)
def q_fk_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    reports = []
    for c, fk, p, pk in _FK_EDGES:
        reports.append(
            fk_edge_report(
                load_table(spark, sf_dir, c),
                fk,
                load_table(spark, sf_dir, p),
                pk,
                label=f"{c}.{fk} -> {p}.{pk}",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("fk_edge")


def fk_edge_report(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, label: str
) -> DataFrame:
    """One FK edge → a 1-row (fk_edge, n_child_rows, n_null_fk,
    n_orphans) report via a broadcast left join on distinct parent
    keys."""
    c = child.select(fk)
    p = parent.select(pk).distinct()
    joined = c.join(F.broadcast(p), c[fk] == p[pk], "left")
    return joined.agg(
        F.lit(label).alias("fk_edge"),
        F.count(F.lit(1)).cast("long").alias("n_child_rows"),
        F.sum(c[fk].isNull().cast("long")).cast("long").alias("n_null_fk"),
        F.sum((c[fk].isNotNull() & p[pk].isNull()).cast("long"))
        .cast("long")
        .alias("n_orphans"),
    )


@query(
    "fd_violation_report",
    """
    WITH checks AS (
      SELECT 'orders: o_custkey -> o_orderpriority' AS fd, lhs, n_rhs
      FROM (
        SELECT o_custkey AS lhs, COUNT(DISTINCT o_orderpriority) AS n_rhs
        FROM orders GROUP BY 1
      )
      UNION ALL
      SELECT 'lineitem: l_partkey -> l_suppkey', lhs, n_rhs
      FROM (
        SELECT l_partkey AS lhs, COUNT(DISTINCT l_suppkey) AS n_rhs
        FROM lineitem GROUP BY 1
      )
      UNION ALL
      SELECT 'lineitem: l_orderkey -> l_returnflag', lhs, n_rhs
      FROM (
        SELECT l_orderkey AS lhs, COUNT(DISTINCT l_returnflag) AS n_rhs
        FROM lineitem GROUP BY 1
      )
      UNION ALL
      SELECT 'nation: n_nationkey -> n_regionkey', lhs, n_rhs
      FROM (
        SELECT n_nationkey AS lhs, COUNT(DISTINCT n_regionkey) AS n_rhs
        FROM nation GROUP BY 1
      )
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_lhs,
           ROUND(CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) + 1e-9, 6) AS violation_rate
    FROM checks GROUP BY fd ORDER BY fd
    """,
    doc="Approximate-functional-dependency violation report "
    "(Huhtala et al. TANE 1999's g3-style error, per candidate FD): "
    "for each declared candidate dependency lhs -> rhs, how many "
    "lhs values map to MORE than one rhs value, the worst fan-out, "
    "and the violation rate — the schema-drift/denormalization "
    "screen the reference's existence/range DQ checks "
    "(DWH_Quality_Checks.sql) cannot express (a silently "
    "multi-sourced part or a customer spread across priorities is "
    "invisible to null/range tests). Four candidate FDs across the "
    "star schema, each ONE map-side-combined groupBy + exact "
    "COUNT(DISTINCT rhs) at lhs grain, reduced to a 4-row report — "
    "per-FD legs are independent scans unioned at summary grain, "
    "all counts exact integers, one CR division for the rate.",
)
def q_fd_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    checks = [
        ("orders: o_custkey -> o_orderpriority", "orders", "o_custkey",
         "o_orderpriority"),
        ("lineitem: l_partkey -> l_suppkey", "lineitem", "l_partkey",
         "l_suppkey"),
        ("lineitem: l_orderkey -> l_returnflag", "lineitem", "l_orderkey",
         "l_returnflag"),
        ("nation: n_nationkey -> n_regionkey", "nation", "n_nationkey",
         "n_regionkey"),
    ]
    outs = []
    for fd, table, lhs, rhs in checks:
        t = load_table(spark, sf_dir, table)
        g = t.groupBy(F.col(lhs).alias("lhs")).agg(
            F.countDistinct(rhs).alias("n_rhs")
        )
        outs.append(
            g.agg(
                F.lit(fd).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
                F.max("n_rhs").cast("long").alias("max_rhs_per_lhs"),
                F.round(
                    F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).cast(
                        "double"
                    )
                    / F.count(F.lit(1)).cast("double")
                    + F.lit(1e-9),
                    6,
                ).alias("violation_rate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("fd")
