"""Unit tests for operators/rank.py: the two-phase global
row_number / prefix-sum must be bit-identical to the unpartitioned
window it replaces, and NTILE-from-rank must match F.ntile exactly
(every residue class of n mod k)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.operators.rank import (
    ntile_from_row_number,
    two_phase_window,
)


def _frame(spark, n, seed=7):
    rng = random.Random(seed)
    rows = [
        # duplicate-heavy value domain so range buckets split ties
        (i, rng.randint(0, 50), rng.randint(-1000, 1000))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id int, v int, amt int")


@pytest.mark.parametrize("buckets", [1, 3, 8])
def test_row_number_matches_single_window(spark, buckets):
    df = _frame(spark, 500)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = two_phase_window(df, order, buckets=buckets)
    ref = df.withColumn("__rn", F.row_number().over(Window.orderBy(*order)))
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_desc_order_and_running_sum(spark):
    df = _frame(spark, 400, seed=11)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = two_phase_window(
        df, order, row_col="rn", sum_cols={"amt": "cum_amt"}, buckets=5
    )
    w = Window.orderBy(*order)
    ref = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "cum_amt",
        F.sum("amt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_sum_only_no_row_number(spark):
    df = _frame(spark, 120, seed=3)
    order = [F.col("id").asc()]
    got = two_phase_window(
        df, order, row_col=None, sum_cols={"amt": "c"}, buckets=4
    )
    assert "__rn" not in got.columns
    ref = df.withColumn(
        "c",
        F.sum("amt").over(
            Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert got.exceptAll(ref).count() == 0


def test_empty_frame(spark):
    df = _frame(spark, 0)
    got = two_phase_window(df, [F.col("id").asc()], sum_cols={"amt": "c"})
    assert got.count() == 0
    assert got.columns == ["id", "v", "amt", "__rn", "c"]


@pytest.mark.parametrize("n,k", [(1, 10), (7, 10), (10, 10), (23, 10), (100, 7), (101, 7)])
def test_ntile_formula_matches_spark_ntile(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").cast("int").alias("id"))
    ref = df.select(
        "id", F.ntile(k).over(Window.orderBy("id")).alias("t")
    )
    got = df.select(
        "id", ntile_from_row_number(F.col("id"), n, k).alias("t")
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_two_phase_plan_has_no_frame_sized_single_partition_window(spark):
    """The frame-level window must be partitioned by the range-bucket
    id; the only SinglePartition stage is the bucket-offset cumsum
    over ≤ buckets rows (constant-bounded, the value_cumsum level-2
    pattern)."""
    df = _frame(spark, 300)
    got = two_phase_window(df, [F.col("v").asc(), F.col("id").asc()], buckets=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    # the data-sized window runs under hashpartitioning(__pid)
    assert "hashpartitioning(__pid" in plan
    import re

    # no window spec ordered directly on the data columns without the
    # __pid partition key (an unpartitioned frame-sized window)
    assert not re.search(r"windowspecdefinition\(v#\d+ ASC", plan)


def test_ranks_survive_exchange_reuse_disabled(spark):
    """The two `ranged` consumers (local window + bucket totals)
    normally share one shuffle via exchange reuse; RangePartitioner's
    cut points are NOT stable across separate executions, so with
    `spark.sql.exchange.reuse=false` the helper must pin the bucketing
    (eager localCheckpoint) or offsets silently corrupt — reproduced
    at 400k rows pre-fix (r12 ADVICE). Large-ish frame + many buckets
    so divergent reservoir samples would actually move rows."""
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        df = spark.range(200_000).select(
            F.col("id").cast("int").alias("id"),
            (F.hash("id") % 1000).alias("v"),
        )
        order = [F.col("v").asc(), F.col("id").asc()]
        got = two_phase_window(df, order, buckets=32)
        ref = df.withColumn(
            "__rn", F.row_number().over(Window.orderBy(*order))
        )
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")


@pytest.mark.parametrize("buckets", [1, 4, 7])
def test_grouped_row_number_and_sums_match_partitioned_window(spark, buckets):
    df = _frame(spark, 400, seed=19).withColumn(
        "g", (F.col("id") % 3).cast("int")
    )
    order = [F.col("v").asc(), F.col("id").asc()]
    got = two_phase_window(
        df,
        order,
        partition_by=["g"],
        row_col="rn",
        sum_cols={"amt": "cum"},
        buckets=buckets,
    )
    w = Window.partitionBy("g").orderBy(*order)
    ref = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "cum",
        F.sum("amt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
