"""Slowly-Changing-Dimension Type 2: dimension history with
validity intervals.

The reference keeps Type-1 dimensions only — its upserts overwrite
attributes in place (`dags/SQL/insert_data_into_bronze.sql:62-77`
ON CONFLICT DO UPDATE; SURVEY.md §2.8 M1), so churn attribute history
is lost between snapshots. SCD2 is the standard warehouse answer:
every key carries a timeline of versions ``[valid_from, valid_to)``
with exactly one open (current) version. This module provides the
full rebuild from a change log and the incremental merge of a new
change batch — both as window/join compositions, no driver loops.

Validity bounds are epoch-micros longs; the open end is
``OPEN_END_US`` (int64 max) rather than NULL so interval predicates
(``valid_from <= t AND t < valid_to``) need no null branch and the
column stays join/filter-friendly in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPEN_END_US = 9223372036854775807  # int64 max = open-ended version


def scd2_from_changes(
    changes: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Build the full SCD2 table from an append-only change log.

    Per key ordered by (ts, tiebreak): (1) collapse no-op changes —
    a row whose attributes null-safely equal the previous row's opens
    no new version; (2) ``valid_from`` = the change time,
    ``valid_to`` = the NEXT kept change's time (``OPEN_END_US`` for
    the last). Two window passes over ONE shuffle on the key (the
    collapse filter preserves the partitioning and sort, so the
    second window reuses them).

    Output: ``key_cols + attr_cols + valid_from_us, valid_to_us,
    is_current``. Deterministic under duplicate timestamps via
    ``tiebreak_col`` (carried through both windows).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_us_col).asc(), F.col(tiebreak_col).asc()
    )
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    kept = changes.withColumn(
        "__noop", attrs.eqNullSafe(F.lag(attrs).over(w))
    ).filter(~F.col("__noop"))
    valid_to = F.coalesce(
        F.lead(F.col(ts_us_col)).over(w), F.lit(OPEN_END_US)
    )
    return kept.select(
        *key_cols,
        *attr_cols,
        F.col(ts_us_col).alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us") == F.lit(OPEN_END_US))


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Incrementally merge a new change batch into an existing SCD2
    table (M1's keyed-upsert shape, history-preserving).

    Only the keys PRESENT in the batch are touched: closed history
    rows pass through untouched, each touched key's current row is
    re-opened as a seed change, and :func:`scd2_from_changes` re-runs
    over seed ∪ batch for those keys only — closing the current
    version at the first real change and appending the new timeline.
    Unseen keys in the batch create fresh version-1 rows.

    Assumes the watermark contract of the extract loop
    (plans/extract.py): batch changes are not older than the key's
    current ``valid_from_us`` — late corrections go through the
    reprocess path, which rebuilds the affected keys from the full
    log. Cost: key-hash semi/anti joins plus one shuffle of
    |touched keys' current rows| + |batch| — never a rebuild of the
    untouched history.
    """
    batch_keys = changes.select(*key_cols).distinct()
    untouched = dim.join(batch_keys, key_cols, "left_anti")
    touched = dim.join(batch_keys, key_cols, "left_semi")
    closed_history = touched.filter(~F.col("is_current"))
    seed = touched.filter(F.col("is_current")).select(
        *key_cols,
        *attr_cols,
        F.col("valid_from_us").alias(ts_us_col),
        # seed sorts before any same-instant batch row: the current
        # version wins no-op collapse against an echoing batch row
        F.lit(-1).cast("long").alias(tiebreak_col),
    )
    batch = changes.select(*key_cols, *attr_cols, ts_us_col, tiebreak_col)
    recomputed = scd2_from_changes(
        seed.unionByName(batch), key_cols, ts_us_col, attr_cols, tiebreak_col
    )
    return untouched.unionByName(closed_history).unionByName(recomputed)


def _register_queries() -> None:
    from pyspark.sql import SparkSession

    from teleco_etl_pipeline_spark.functions import epoch_us
    from teleco_etl_pipeline_spark.plans.registry import query
    from teleco_etl_pipeline_spark.sources.tables import load_table

    @query(
        "scd2_user_value",
        """
        WITH ch AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                 ROUND(value + 1e-9, 2) AS val
          FROM events WHERE event_type = 'purchase'
        ), marked AS (
          SELECT *, val IS NOT DISTINCT FROM LAG(val) OVER w AS noop
          FROM ch
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        ), ver AS (
          SELECT user_id, val, ts_us AS valid_from_us,
                 COALESCE(LEAD(ts_us) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id),
                          9223372036854775807) AS valid_to_us
          FROM marked WHERE NOT noop
        )
        SELECT user_id, val, valid_from_us, valid_to_us,
               valid_to_us = 9223372036854775807 AS is_current
        FROM ver
        """,
        doc="SCD Type-2 dimension history built from the purchase "
        "change log: per-user value versions with [valid_from, "
        "valid_to) epoch-micros intervals, no-op changes collapsed "
        "null-safely, int64-max open end. One shuffle on the key "
        "serves both window passes.",
    )
    def q_scd2_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        ch = ev.filter(F.col("event_type") == "purchase").select(
            "user_id",
            "event_id",
            epoch_us("ts").alias("ts_us"),
            F.round(F.col("value") + F.lit(1e-9), 2).alias("val"),
        )
        return scd2_from_changes(
            ch,
            key_cols=["user_id"],
            ts_us_col="ts_us",
            attr_cols=["val"],
            tiebreak_col="event_id",
        )


_register_queries()
