"""SCD Type-2 operator: full rebuild semantics, incremental apply ≡
full rebuild, and the one-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.operators.scd import (
    OPEN_END_US,
    scd2_apply,
    scd2_from_changes,
)

COLS = ["k", "eid", "ts_us", "v"]


def _build(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _versions(df):
    return sorted(
        (r["k"], r["v"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
        for r in df.collect()
    )


def test_scd2_build_collapses_noops_and_closes_intervals(spark):
    ch = _build(
        spark,
        [
            (1, 10, 100, "a"),
            (1, 11, 200, "a"),  # no-op: same value → collapsed
            (1, 12, 300, "b"),
            (2, 20, 150, "x"),
        ],
    )
    got = _versions(scd2_from_changes(ch, ["k"], "ts_us", ["v"], "eid"))
    assert got == [
        (1, "a", 100, 300, False),
        (1, "b", 300, OPEN_END_US, True),
        (2, "x", 150, OPEN_END_US, True),
    ]


def test_scd2_duplicate_timestamp_tiebreak(spark):
    ch = _build(spark, [(1, 10, 100, "a"), (1, 11, 100, "b")])
    got = _versions(scd2_from_changes(ch, ["k"], "ts_us", ["v"], "eid"))
    # eid orders the same-instant changes: "a" then "b"; "a" gets a
    # zero-length interval, "b" is current.
    assert got == [
        (1, "a", 100, 100, False),
        (1, "b", 100, OPEN_END_US, True),
    ]


def test_scd2_apply_equals_full_rebuild(spark):
    day1 = _build(
        spark,
        [(1, 10, 100, "a"), (1, 12, 300, "b"), (2, 20, 150, "x")],
    )
    day2 = _build(
        spark,
        [
            (1, 30, 400, "b"),  # echo of current value → no new version
            (2, 31, 500, "y"),  # real change
            (3, 32, 450, "new"),  # unseen key
        ],
    )
    dim = scd2_from_changes(day1, ["k"], "ts_us", ["v"], "eid")
    merged = scd2_apply(dim, day2, ["k"], "ts_us", ["v"], "eid")
    full = scd2_from_changes(day1.unionByName(day2), ["k"], "ts_us", ["v"], "eid")
    assert _versions(merged) == _versions(full)
    # exactly one open version per key
    cur = merged.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur) and len(cur) == 3


def test_scd2_build_single_shuffle(spark):
    ch = spark.range(100).selectExpr(
        "id % 7 AS k", "id AS eid", "id * 11 AS ts_us",
        "CAST(id % 3 AS STRING) AS v"
    )
    plan = (
        scd2_from_changes(ch, ["k"], "ts_us", ["v"], "eid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_scd2_point_in_time_lookup(spark):
    """The interval contract: an as-of probe at any instant hits
    exactly one version per key."""
    ch = _build(
        spark, [(1, 10, 100, "a"), (1, 12, 300, "b"), (1, 13, 700, "c")]
    )
    dim = scd2_from_changes(ch, ["k"], "ts_us", ["v"], "eid")
    for t, expect in [(100, "a"), (299, "a"), (300, "b"), (10_000, "c")]:
        hit = dim.filter(
            (F.col("valid_from_us") <= t) & (F.lit(t) < F.col("valid_to_us"))
        ).collect()
        assert [r["v"] for r in hit] == [expect], t
