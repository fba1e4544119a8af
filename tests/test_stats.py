"""Distribution-statistics operators (plans/stats.py) + the
incremental materialized-view refresh (operators/cdc.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.operators.cdc import incremental_agg_refresh
from teleco_etl_pipeline_spark.plans.registry import all_queries
from teleco_etl_pipeline_spark.plans.stats import skyline_2d


def test_skyline_matches_naive_dominance(spark):
    # Known frontier: (1,5) and (3,9) survive; (2,5) dominated by
    # (1,5) on cost, (3,7) by (3,9) on gain, (4,9) by (3,9) on cost.
    rows = [(1, 5), (2, 5), (3, 7), (3, 9), (4, 9), (1, 5)]
    df = spark.createDataFrame(rows, ["cost", "gain"])
    got = {
        (r.cost, r.gain, r.n_rows)
        for r in skyline_2d(df, "cost", "gain").collect()
    }
    assert got == {(1, 5, 2), (3, 9, 1)}

    # Cross-check against the O(n^2) dominance definition.
    naive = set()
    for c, g in set(rows):
        dominated = any(
            bc <= c and bg >= g and (bc < c or bg > g)
            for bc, bg in set(rows)
        )
        if not dominated:
            naive.add((c, g))
    assert {(c, g) for c, g, _ in got} == naive


def test_mannwhitney_matches_textbook_small_sample(spark, sf_dir):
    # Exact hand check on the registered query's own machinery is
    # the oracle's job; here pin the scipy-free closed form on a
    # tiny frame: g1={1,3,5}, g2={2,2,4} -> ranks 1..6 with a tie at
    # 2: avg rank 2.5 each. R1 = 1 + 4 + 6 = 11, U1 = 11 - 6 = 5.
    df = spark.createDataFrame(
        [(1, 1), (1, 3), (1, 5), (2, 2), (2, 2), (2, 4)], ["grp", "cents"]
    )
    from pyspark.sql import Window

    r2 = (
        2 * F.rank().over(Window.orderBy("cents"))
        + F.count(F.lit(1)).over(Window.partitionBy("cents"))
        - 1
    )
    got = (
        df.withColumn("r2", r2)
        .filter(F.col("grp") == 1)
        .agg(F.sum("r2"))
        .collect()[0][0]
    )
    assert got == 22  # 2*R1
    u1 = (got - 3 * (3 + 1)) / 2
    assert u1 == 5.0


def test_gini_known_distributions(spark):
    # Perfect equality -> gini 0; one-holder-takes-all over n=4 ->
    # gini = (n-1)/n = 0.75 by the sorted-rank identity.
    from pyspark.sql import Window

    def gini_of(values):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)], ["k", "cents"]
        )
        w = Window.orderBy("cents", "k")
        ranked = df.select(
            "cents", F.row_number().over(w).alias("i")
        )
        n = len(values)
        row = ranked.agg(
            F.sum(F.col("i") * F.col("cents")).alias("six"),
            F.sum("cents").alias("sx"),
        ).collect()[0]
        return (2 * row.six - (n + 1) * row.sx) / (n * row.sx)

    assert abs(gini_of([5, 5, 5, 5])) < 1e-12
    assert abs(gini_of([0, 0, 0, 100]) - 0.75) < 1e-12


def test_ks_statistic_disjoint_supports_is_one(spark, sf_dir):
    # Fully separated samples must give D = 1 by construction; the
    # registered query's integer formulation reproduces that.
    q = all_queries()["ks_priority_totalprice"]
    out = q.build(spark, sf_dir).collect()[0]
    assert 0.0 <= out.d_stat <= 1.0
    assert out.n_urgent > 0 and out.n_low > 0


def test_acf_of_pure_weekly_cycle_peaks_at_lag7(spark):
    # Synthetic 28-day series with an exact period-7 pattern: acf at
    # lag 7 must be 1 (up to the display rounding), lag 1 well below.
    days = [(i, [10, 2, 3, 4, 5, 6, 7][i % 7]) for i in range(28)]
    df = spark.createDataFrame(days, ["i", "x"])
    pairs = (
        df.alias("a")
        .join(df.alias("b"), F.col("b.i") == F.col("a.i") + 7)
        .select(F.col("a.x").alias("x"), F.col("b.x").alias("y"))
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    num = m.n * m.sxy - m.sx * m.sy
    den = math.sqrt((m.n * m.sxx - m.sx**2) * (m.n * m.syy - m.sy**2))
    assert abs(num / den - 1.0) < 1e-12


def test_cusum_flags_injected_level_shift(spark):
    # 30 days at rate 10 then 30 days at rate 20: the max |S| day
    # must sit at the regime boundary.
    rows = [(i, 10 if i < 30 else 20) for i in range(60)]
    df = spark.createDataFrame(rows, ["day", "c"])
    n, t = 60, sum(c for _, c in rows)
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = df.select(
        "day",
        (F.sum("c").over(w) * n - F.row_number().over(Window.orderBy("day")) * t).alias(
            "dev"
        ),
    )
    top = s.orderBy(F.abs(F.col("dev")).desc()).first()
    assert top.day == 29  # last day of the old regime


def test_seasonal_decompose_is_additive(spark, sf_dir):
    # value == trend + seasonal + residual (within display rounding)
    # and the month sequence the window math assumes is gap-free.
    q = all_queries()["revenue_seasonal_decompose"]
    rows = q.build(spark, sf_dir).collect()
    assert len(rows) > 12
    months = [r.month for r in rows]
    assert months == sorted(months)
    for r in rows:
        recon = r.trend + r.seasonal + r.residual
        assert abs(recon - r.revenue_cents) < 0.01 * abs(r.revenue_cents) + 1


def test_incremental_refresh_equals_full_recompute(spark):
    # Inserts, deletes, value updates AND group-moving updates; the
    # delta-maintained view must equal the from-scratch aggregate,
    # including dropping a group whose count reaches zero.
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        ["k", "g", "m"],
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),   # unchanged
            (2, "b", 20),   # group move a -> b
            (3, "b", 35),   # value update
            (5, "a", 50),   # insert
            # 4 deleted -> group c disappears entirely
        ],
        ["k", "g", "m"],
    )
    base = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("m").alias("m_sum")
    )
    got = incremental_agg_refresh(
        base,
        old,
        new,
        keys=["k"],
        group_col="g",
        measures={"m_sum": "m"},
        compare_cols=["g", "m"],
    )
    expect = new.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("m").alias("m_sum")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_theilsen_robust_to_outlier(spark):
    # Linear series y = 5x with one wild outlier: OLS slope is pulled
    # far off, the pairwise-slope median stays ~5.
    pts = [(i, 5 * i if i != 10 else 100000) for i in range(1, 21)]
    df = spark.createDataFrame(pts, ["i", "y"])
    a, b = df.alias("a"), df.alias("b")
    slopes = a.join(b, F.col("b.i") > F.col("a.i")).select(
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.i") - F.col("a.i"))
        ).alias("slope")
    )
    vals = sorted(r.slope for r in slopes.collect())
    n = len(vals)
    med = (vals[(n - 1) // 2] + vals[n // 2]) / 2
    assert abs(med - 5.0) < 1e-9


def test_bfs_levels_partition_reachable_set(spark, sf_dir):
    # Levels are disjoint by construction; on the bipartite trade
    # graph even levels are all customers, odd levels all suppliers.
    q = all_queries()["trade_graph_bfs_levels"]
    rows = q.build(spark, sf_dir).collect()
    assert [r.level for r in rows] == [0, 1, 2, 3]
    for r in rows:
        assert r.n_nodes == r.n_customers + r.n_suppliers
        if r.level % 2 == 0:
            assert r.n_suppliers == 0
        else:
            assert r.n_customers == 0
    assert rows[0].n_nodes > 0


def test_moments_profile_matches_python(spark):
    # crafted skewed sample: exponential-ish values
    vals = [1.0, 1.0, 2.0, 3.0, 5.0, 8.0, 13.0, 50.0]
    df = spark.createDataFrame(
        [("1-URGENT", v) for v in vals], ["o_orderpriority", "o_totalprice"]
    )
    df.write.mode("overwrite").parquet("/tmp/__mom/orders.parquet")
    row = (
        all_queries()["priority_moments_profile"]
        .build(spark, "/tmp/__mom")
        .collect()[0]
    )
    n = len(vals)
    m1 = sum(vals) / n
    mu2 = sum((v - m1) ** 2 for v in vals) / n
    mu3 = sum((v - m1) ** 3 for v in vals) / n
    mu4 = sum((v - m1) ** 4 for v in vals) / n
    assert row.n == n
    assert abs(row.mean_dollars - round(m1, 2)) < 0.011
    assert abs(row.stddev_pop - mu2**0.5) < 0.02
    assert abs(row.skewness - mu3 / mu2**1.5) < 0.001
    assert abs(row.excess_kurtosis - (mu4 / mu2**2 - 3)) < 0.001
    # a right-tailed sample is positively skewed and leptokurtic
    assert row.skewness > 1.0
    assert row.excess_kurtosis > 0.0


def test_funnel_latency_quantiles(spark, sf_dir):
    row = (
        all_queries()["funnel_latency_quantiles"].build(spark, sf_dir).collect()[0]
    )
    assert row.n_converted > 0
    assert 0 <= row.p50_s <= row.p90_s <= row.p99_s <= row.max_s


def test_cuped_preserves_pooled_mean_and_bounds(spark, sf_dir):
    """CUPED invariants: the user-weighted mean of the ADJUSTED
    metric equals the user-weighted raw mean (the adjustment is a
    zero-sum recentring: Σ nv·theta·(mean_x_v − mean_x) = 0 by
    construction of the pooled mean), var_reduction = rho² ∈ [0, 1],
    and the two deterministic md5 variants are both populated."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    rows = (
        all_queries()["events_cuped_readout"].build(spark, sf_dir).collect()
    )
    assert sorted(r.variant for r in rows) == ["A", "B"]
    n = sum(r.n_users for r in rows)
    assert all(r.n_users > 0 for r in rows)
    raw = sum(r.n_users * r.mean_y for r in rows) / n
    adj = sum(r.n_users * r.mean_y_adj for r in rows) / n
    # per-variant means are rounded to 4 decimals, so the weighted
    # sums agree to rounding tolerance, not exactly
    assert abs(raw - adj) < 1e-3
    vr = {r.var_reduction for r in rows}
    assert len(vr) == 1
    assert 0.0 <= vr.pop() <= 1.0


def test_exact_percentiles_matches_numpy_reference(spark):
    """operators/quantiles.exact_percentiles must reproduce the
    linear-interpolation percentile (numpy 'linear' == DuckDB
    quantile_cont == Spark percentile) on adversarial small inputs:
    heavy ties, single row, all-equal, negatives, and NULLs
    (excluded on both sides)."""
    import numpy as np

    from teleco_etl_pipeline_spark.operators.quantiles import (
        exact_percentiles,
    )

    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    cases = [
        [1.0],
        [5.0, 5.0, 5.0, 5.0],
        [3.0, 1.0, 2.0],
        [-2.5, 0.0, 0.0, 0.0, 7.25, 7.25, 100.0],
        [float(v) for v in range(100)],
        [0.01 * ((v * 7919) % 1000) for v in range(500)],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = exact_percentiles(df, "x", qs)
        want = [float(np.percentile(np.array(vals), q * 100)) for q in qs]
        for g, w in zip(got, want):
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (vals[:5], g, w)
    # NULLs excluded, empty -> None per percentile
    df = spark.createDataFrame(
        [(None,), (4.0,), (None,), (8.0,)], "x double"
    )
    got = exact_percentiles(df, "x", [0.5])
    assert abs(got[0] - 6.0) < 1e-12
    empty = spark.createDataFrame([(None,)], "x double")
    assert exact_percentiles(empty, "x", [0.5]) == [None]


def test_hill_alpha_positive_and_degenerate_sentinel(spark, sf_dir, tmp_path):
    """On the real events table the estimator returns a positive
    finite alpha with k = clamp(n/3, 5, 100); a corpus where every
    user has the SAME count has a zero tail-sum and must emit the
    0.0 sentinel, never divide by zero."""
    import datetime as dt

    from pyspark.sql import Row

    from teleco_etl_pipeline_spark.plans.registry import all_queries

    (r,) = (
        all_queries()["events_powerlaw_tail_fit"].build(spark, sf_dir).collect()
    )
    assert r.k_tail == max(5, min(100, r.n_users // 3))
    assert r.hill_alpha > 0
    assert r.x_tail_min >= 1

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=u * 10 + i,
            ts=base + dt.timedelta(minutes=u * 10 + i),
            user_id=u,
            event_type="a",
            value=1.0,
            props="{}",
        )
        for u in range(20)
        for i in range(3)  # every user: exactly 3 events
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    (d,) = (
        all_queries()["events_powerlaw_tail_fit"]
        .build(spark, str(tmp_path))
        .collect()
    )
    assert d.hill_alpha == 0.0 and d.x_tail_min == 3


def test_value_cumsum_multi_measure_matches_window(spark):
    """The multi-measure form (KS's d1/d2 pair) must equal the plain
    inclusive window cumsum per measure, on a duplicate-free value
    frame with gaps and a skewed distribution."""
    import random

    from pyspark.sql import Window

    from teleco_etl_pipeline_spark.operators.quantiles import value_cumsum

    rng = random.Random(23)
    vals = sorted(rng.sample(range(-5000, 5000), 700))
    rows = [(v, rng.randint(0, 9), rng.randint(0, 9)) for v in vals]
    vc = spark.createDataFrame(rows, "cents long, d1 long, d2 long")
    got = value_cumsum(vc, "cents", sum_cols={"d1": "c1", "d2": "c2"})
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ref = vc.select(
        "cents",
        "d1",
        "d2",
        F.sum("d1").over(w).alias("c1"),
        F.sum("d2").over(w).alias("c2"),
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_value_prefix_max_matches_window(spark):
    """Exclusive two-level prefix max == the unpartitioned exclusive
    window max, including the NULL on the global first row and ties
    across bucket boundaries."""
    import random

    from pyspark.sql import Window

    from teleco_etl_pipeline_spark.operators.quantiles import (
        value_prefix_max,
    )

    rng = random.Random(41)
    vals = sorted(rng.sample(range(0, 100000), 900))
    rows = [(v, rng.randint(-50, 50)) for v in vals]
    vc = spark.createDataFrame(rows, "cost long, gain long")
    got = value_prefix_max(vc, "cost", "gain", out_col="pm")
    w = Window.orderBy("cost").rowsBetween(Window.unboundedPreceding, -1)
    ref = vc.select("cost", "gain", F.max("gain").over(w).alias("pm"))
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
