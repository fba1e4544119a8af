"""Two-phase global ranks and prefix sums — the scale-safe form of
``Window.orderBy(...)`` with no partition key.

An UNPARTITIONED Spark window (``row_number().over(Window.orderBy(x))``,
NTILE, running SUM) compiles to ``Exchange SinglePartition`` + one
WindowExec task holding EVERY row — correct at test SFs, a
single-executor ceiling at 100×.  The classical fix (the same one
Spark's own ``orderBy`` uses for global *sorts*) is a two-phase rank:

1. ``repartitionByRange(B, *order)`` — Spark's RangePartitioner
   samples cut points (reservoir per input split) and assigns each row
   a range bucket; the full sort tuple (value + unique tiebreak) is
   the range key, so even a single hot value splits across buckets and
   no bucket exceeds ~n/B rows, B = ``spark.sql.shuffle.partitions``
   (cluster-sized in prod).
2. per-bucket LOCAL window partitioned by ``spark_partition_id()`` —
   row_number / running sums over ≤ n/B rows per task.
3. bucket offsets: one groupBy over the ≤B bucket totals, cumsummed in
   a single task bounded by the CONSTANT B (the sanctioned
   ``value_cumsum`` level-2 pattern), broadcast-joined back.
   ``global = offset + local``.

Determinism: ranges are contiguous and ordered by partition id
(partition i's keys sort before partition i+1's), so
``offset + local`` is exactly the single-window result; the sampled
cut points only move WORK between buckets, never values.  Results are
bit-identical to the unpartitioned window for any total ordering
(callers supply a unique tiebreak column, same as they had to for the
single-partition form).

One subtlety the bit-identity claim rests on: the ``ranged`` frame
feeds TWO plan branches (the local window and the bucket totals), and
RangePartitioner's sampled cut points are NOT deterministic across
separate executions (the reservoir seed depends on the RDD id).  The
two branches therefore must observe the SAME physical bucketing.
When ``spark.sql.exchange.reuse`` is enabled (Spark's default) the two
canonically-identical exchange subtrees deduplicate into one shuffle —
both branches read the same shuffle files, at zero extra cost.  When a
runtime disables exchange reuse, that guarantee is gone (each branch
would re-sample its own cut points, silently corrupting offsets), so
the helper detects the conf and pins the bucketing with an eager
``localCheckpoint`` — the repo's materialized-superstep rule for
multi-consumer nondeterministic lineage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_window(
    df: DataFrame,
    order_by: list[Column],
    *,
    partition_by: list[str] | None = None,
    row_col: str | None = "__rn",
    sum_cols: dict[str, str] | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Append a global ``row_number`` (``row_col``) and/or inclusive
    running sums (``sum_cols``: source column -> output column) over
    the total order ``order_by``, computed with the two-phase plan
    above (module docstring) — no single-partition window ever holds
    the frame.

    ``partition_by`` (optional, column NAMES) generalizes to GROUPED
    windows — ``row_number().over(Window.partitionBy(g).orderBy(...))``
    where a low-cardinality ``g`` would otherwise put a whole group in
    one task: the range key becomes (g, *order), so a group's buckets
    are contiguous in partition-id order; the local window partitions
    by (bucket, g); and the per-group bucket offsets cumsum over ≤ B
    rows per group (window partitioned by g over the bucket-totals
    frame — constant-bounded, the same level-2 shape).

    ``order_by`` must be a TOTAL order within each group (include a
    unique tiebreak); with ties the bucket boundary could otherwise
    split a tie group arbitrarily — exactly the contract the
    single-window form already required for determinism.
    """
    sum_cols = sum_cols or {}
    part = list(partition_by or [])
    spark = df.sparkSession
    if buckets:
        b = buckets
    else:
        # "spark.sql.shuffle.partitions" may be non-numeric on managed
        # runtimes (e.g. "auto"); fall back to the cluster's default
        # parallelism rather than erroring every caller.
        try:
            b = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (ValueError, TypeError):
            b = spark.sparkContext.defaultParallelism
    range_key = [F.col(p).asc() for p in part] + list(order_by)
    ranged = df.repartitionByRange(b, *range_key).withColumn(
        "__pid", F.spark_partition_id()
    )
    # The two consumers below (local window + bucket totals) MUST see
    # one physical bucketing — RangePartitioner samples fresh cut
    # points per execution.  Exchange reuse (Spark default) dedups the
    # two identical exchange subtrees into one shuffle; if a runtime
    # turned it off, materialize the bucketing once instead.
    if spark.conf.get("spark.sql.exchange.reuse", "true").lower() != "true":
        ranged = ranged.localCheckpoint(eager=True)
    w_row = Window.partitionBy("__pid", *part).orderBy(*order_by)
    w_sum = w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ranged
    if row_col is not None:
        local = local.withColumn("__lr", F.row_number().over(w_row))
    for src, out in sum_cols.items():
        local = local.withColumn(f"__ls_{out}", F.sum(src).over(w_sum))
    # Bucket totals: ≤ B + |groups spanning a boundary| rows; each
    # offset cumsum task holds ≤ B rows of ITS group — bounded by the
    # constant B, never by data (value_cumsum level-2 pattern).
    aggs = [F.count(F.lit(1)).alias("__bn")] + [
        F.sum(src).alias(f"__bs_{out}") for src, out in sum_cols.items()
    ]
    totals = ranged.groupBy("__pid", *part).agg(*aggs)
    if part:
        w_off = (
            Window.partitionBy(*part)
            .orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        w_off = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
    off_cols = ["__pid", *part]
    if row_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off_n")
        )
    for _, out in sum_cols.items():
        off_cols.append(
            F.coalesce(
                F.sum(f"__bs_{out}").over(w_off),
                F.lit(0).cast(totals.schema[f"__bs_{out}"].dataType),
            ).alias(f"__off_{out}")
        )
    offsets = totals.select(*off_cols)
    joined = local.join(F.broadcast(offsets), ["__pid", *part])
    out_cols = [F.col(c) for c in df.columns]
    if row_col is not None:
        out_cols.append((F.col("__off_n") + F.col("__lr")).alias(row_col))
    for _, out in sum_cols.items():
        out_cols.append(
            (F.col(f"__off_{out}") + F.col(f"__ls_{out}")).alias(out)
        )
    return joined.select(*out_cols)


def ntile_from_row_number(rn: Column, n: int, k: int) -> Column:
    """Exact NTILE(k) bucket from a 1-based global row_number and the
    frame count ``n`` (a bounded driver statistic, folded as Python
    int) — the SQL-standard distribution both Spark and DuckDB
    implement (first ``n mod k`` buckets get ``n div k + 1`` rows, the
    rest ``n div k``), as pure integer codegen so a two-phase rank
    replaces an unpartitioned NTILE window bit-for-bit.  The only
    row-level arithmetic is ``floor((rn - off) / size)`` with integer
    operands — exact in double out to n ≈ 2^52 rows (the quotient's
    fractional part is ≥ 1/size ≫ the 2^-52 relative rounding)."""
    q, rem = divmod(n, k)
    thresh = rem * (q + 1)
    small = max(q, 1)
    return (
        F.when(rn <= thresh, F.floor((rn - 1) / F.lit(q + 1)) + 1)
        .otherwise(rem + F.floor((rn - thresh - 1) / F.lit(small)) + 1)
        .cast("int")
    )
