"""Change-data-capture by snapshot differencing (hash-diff).

The warehouse-side CDC primitive when the source can't emit a change
stream (reference context: the bronze full-extract path of
`dags/SQL/Bronze/insert_data_into_bronze.sql` re-lands whole
snapshots — this operator turns two such snapshots into an explicit
added/deleted/changed delta, which is what the incremental
gold/merge layers actually want to consume).

Design: one full-outer join on the business key with an md5 row
fingerprint over the compared columns computed on EACH side before
the join — so the change test is a single string equality, the
compared payload never crosses the shuffle twice, and the wide-row
compare cost is one hash per side however many columns are compared.
Classification:
- key only on the new side           → INSERT
- key only on the old side           → DELETE
- both sides, fingerprints differ    → UPDATE
- both sides, fingerprints equal     → unchanged (dropped — the
  delta is the output; at 100 TB the unchanged mass is the bulk and
  never leaves the join)

Scale (100 TB): the join shuffles (key, fingerprint) pairs — ~40
bytes/row regardless of row width. With both snapshots written
bucketed by the key (catalog.py write path) the join is co-located
and shuffle-free; partition-level pruning applies when snapshots are
date-partitioned. Deterministic: md5 over a canonical '|'-joined
cast-to-string projection with an explicit NULL sentinel (same
idiom as operators/keys.py surrogate hashing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table

_NULL_SENTINEL = "\x00"  # never appears in cast-to-string payloads


def row_fingerprint(cols: Sequence[str]):
    """md5 over the canonical string projection of ``cols`` (order
    matters and is part of the contract; NULL → sentinel so NULL and
    '' hash differently)."""
    return F.md5(
        F.concat_ws(
            "|",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
                for c in cols
            ],
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Delta rows (``change`` ∈ INSERT/DELETE/UPDATE) between two
    snapshots; unchanged rows are dropped inside the join."""
    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in keys],
        row_fingerprint(compare_cols).alias("old_fp"),
    )
    n = new.select(
        *[F.col(k).alias(f"k_{k}") for k in keys],
        row_fingerprint(compare_cols).alias("new_fp"),
    )
    cond = [o[f"k_{k}"] == n[f"k_{k}"] for k in keys]
    j = o.join(n, cond, "full_outer")
    change = (
        F.when(o["old_fp"].isNull(), F.lit("INSERT"))
        .when(n["new_fp"].isNull(), F.lit("DELETE"))
        .when(o["old_fp"] != n["new_fp"], F.lit("UPDATE"))
    )
    return j.select(
        *[F.coalesce(o[f"k_{k}"], n[f"k_{k}"]).alias(k) for k in keys],
        change.alias("change"),
    ).filter(F.col("change").isNotNull())


@query(
    "orders_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey,
             md5(concat_ws('|',
                 coalesce(CAST(o_orderstatus AS VARCHAR), chr(0)),
                 coalesce(CAST(o_totalprice AS VARCHAR), chr(0)))) AS fp
      FROM orders WHERE o_orderdate < DATE '1997-01-01'
    ),
    -- new snapshot: the retention window slid forward (rows before
    -- 1996 aged out => DELETEs) and extends six months further
    -- (=> INSERTs); every 17th key had a source-side status update.
    new AS (
      SELECT o_orderkey,
             md5(concat_ws('|',
                 coalesce(CAST(CASE WHEN o_orderkey % 17 = 0 THEN 'F'
                               ELSE o_orderstatus END AS VARCHAR), chr(0)),
                 coalesce(CAST(o_totalprice AS VARCHAR), chr(0)))) AS fp
      FROM orders WHERE o_orderdate >= DATE '1996-01-01'
                    AND o_orderdate < DATE '1997-07-01'
    )
    SELECT change, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.fp IS NULL THEN 'INSERT'
                  WHEN n.fp IS NULL THEN 'DELETE'
                  WHEN o.fp <> n.fp THEN 'UPDATE' END AS change
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    ) d
    WHERE change IS NOT NULL
    GROUP BY change
    ORDER BY change
    """,
    doc="CDC snapshot hash-diff summary: the orders table at two "
    "sliding retention-window cuts (rows aging out => DELETE, the "
    "window extending => INSERT, a deterministic status override on "
    "every 17th key => UPDATE) reduced to per-class counts + key "
    "ranges. One "
    "full-outer join on (key, md5 row fingerprint) — ~40 bytes/row "
    "shuffled however wide the row; unchanged mass never leaves the "
    "join. The snapshot-differencing path for sources that re-land "
    "full extracts instead of emitting change streams.",
)
def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders")
    old = ords.filter(F.col("o_orderdate") < "1997-01-01").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        ords.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-07-01")
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 17 == 0, F.lit("F")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    delta = snapshot_diff(
        old, new, keys=["o_orderkey"], compare_cols=["o_orderstatus", "o_totalprice"]
    )
    return (
        delta.groupBy("change")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
        .orderBy("change")
    )


def incremental_agg_refresh(
    base: DataFrame,
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    group_col: str,
    measures: dict[str, str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Incremental materialized-view maintenance for additive
    aggregates: refresh ``base`` (= GROUP BY ``group_col`` with
    COUNT(*) + SUM(measures) over the OLD snapshot) to the NEW
    snapshot by re-aggregating ONLY the changed keys.

    The delta algebra for SUM/COUNT views: refreshed = base
    + agg(new-side rows of changed keys) - agg(old-side rows of
    changed keys). INSERTs contribute only to the plus leg, DELETEs
    only to the minus leg, UPDATEs to both — including UPDATEs that
    MOVE a row between groups (the group column is part of the
    compared payload, so a group flip is just minus-old-group /
    plus-new-group). Groups whose refreshed count reaches zero are
    dropped, matching a full recompute exactly.

    Scale (100 TB): the full-snapshot cost is paid ONCE when the
    view is first materialized; each refresh touches (a) the two
    key+fingerprint projections for the diff — ~40 bytes/row
    shuffled, co-located and shuffle-free when snapshots are written
    bucketed by key (catalog.py) — and (b) a semi-join + aggregate
    over the changed keys only, which is delta-sized, not
    snapshot-sized. That is the entire point: refresh cost tracks
    churn, not data volume.

    ``measures`` maps output column name -> source column expression
    (a string Spark SQL expression yielding an integer/long);
    ``compare_cols`` are the RAW snapshot columns whose change makes
    a row count as updated (must cover the group column and every
    measure's inputs).
    """
    delta_keys = snapshot_diff(
        old, new, keys=keys, compare_cols=compare_cols
    ).select(*keys)

    def _leg(snapshot: DataFrame, sign: int) -> DataFrame:
        # No broadcast hint: the delta is churn-sized on a typical
        # refresh but SNAPSHOT-sized on a retention sweep (e.g. the
        # aged-out DELETE mass in priority_view_refresh), where a
        # forced broadcast would OOM the executors. AQE promotes the
        # semi-join to broadcast at runtime whenever the delta
        # measures small, so the common case loses nothing.
        touched = snapshot.join(delta_keys, list(keys), "semi")
        return touched.groupBy(F.col(group_col).alias("g")).agg(
            (F.lit(sign) * F.count(F.lit(1))).alias("_n"),
            *[
                (F.lit(sign) * F.sum(F.expr(src))).alias(out)
                for out, src in measures.items()
            ],
        )

    # base arrives as (group_col, n_rows, <measures>) — rename into
    # the legs' shape and stack all three contributions.
    legs = (
        base.select(
            F.col(group_col).alias("g"),
            F.col("n_rows").alias("_n"),
            *measures.keys(),
        )
        .unionByName(_leg(old, -1))
        .unionByName(_leg(new, +1))
    )
    refreshed = legs.groupBy("g").agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(c).alias(c) for c in measures.keys()],
    )
    return refreshed.filter(F.col("n_rows") > 0).select(
        F.col("g").alias(group_col), "n_rows", *measures.keys()
    )


@query(
    "priority_view_refresh",
    """
    WITH new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 23 = 0 THEN '3-MEDIUM'
                  ELSE o_orderpriority END AS o_orderpriority,
             o_totalprice
      FROM orders WHERE o_orderdate >= DATE '1996-01-01'
                    AND o_orderdate < DATE '1997-07-01'
    )
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM new
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    doc="Incremental materialized-view refresh, verified against the "
    "full recompute: the per-priority (count, revenue) view is "
    "materialized over the OLD orders snapshot, the retention window "
    "slides (deletes + inserts) and every 23rd key's priority is "
    "rewritten at the source (group-moving updates); the engine "
    "refreshes the view via the CDC delta algebra (base + new-side "
    "changed keys - old-side changed keys, only churn re-aggregated) "
    "while the oracle recomputes from scratch on the new snapshot. "
    "Equality of the two IS the correctness claim of incremental "
    "view maintenance. Refresh cost tracks churn, not table size.",
)
def q_priority_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    old = ords.filter(F.col("o_orderdate") < "1997-01-01").select(*cols)
    new = (
        ords.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-07-01")
        )
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 23 == 0, F.lit("3-MEDIUM")).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .select(*cols)
    )
    measures = {
        "revenue_cents": "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
    }
    base = old.groupBy(
        F.col("o_orderpriority").alias("o_orderpriority")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr(measures["revenue_cents"])).alias("revenue_cents"),
    )
    refreshed = incremental_agg_refresh(
        base,
        old,
        new,
        keys=["o_orderkey"],
        group_col="o_orderpriority",
        measures=measures,
        compare_cols=["o_orderpriority", "o_totalprice"],
    )
    return refreshed.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
    ).orderBy("priority")
