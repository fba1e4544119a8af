"""Tolerance checks for sketch-based scale twins of exact queries."""

from __future__ import annotations

from teleco_etl_pipeline_spark.plans.registry import all_queries


def test_lsh_pairs_subset_of_exact_neardups(spark, sf_dir):
    """Sign-LSH candidates are exact-cosine-verified, so every emitted
    pair must appear in the all-pairs exact twin (recall < 1 is
    expected; precision must be 1)."""
    qs = all_queries()
    exact = {
        (r["id_a"], r["id_b"])
        for r in qs["embedding_neardup"].build(spark, sf_dir).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in qs["embedding_lsh_pairs"].build(spark, sf_dir).collect()
    }
    assert lsh <= exact


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    qs = all_queries()
    exact = {
        r["l_returnflag"]: r
        for r in qs["quantile_profile"].build(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in qs["approx_quantile_profile"].build(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("price_q1", "price_median", "price_q3"):
            # accuracy=10000 ⇒ rank error ≤ 1e-4; on lineitem prices
            # (~[900, 105k]) allow 1% relative value error.
            assert abs(a[col] - e[col]) <= 0.01 * abs(e[col]) + 1e-6, (
                flag,
                col,
                a[col],
                e[col],
            )


def test_user_streaks_gaps_and_islands(spark):
    """Crafted day grid: 3 consecutive days, a gap, then 2 more."""
    import datetime as dt

    from teleco_etl_pipeline_spark.plans.events import q_events_user_streaks

    rows = [
        (i, dt.datetime(2024, 1, d, 12, 0, 0), 7, "click", 1.0, "{}")
        for i, d in enumerate([1, 1, 2, 3, 7, 8])  # day 1 twice: distinct'd
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet("/tmp/streak_ev/events.parquet")
    (row,) = q_events_user_streaks(spark, "/tmp/streak_ev").collect()
    assert (row["active_days"], row["n_streaks"], row["longest_streak"]) == (5, 2, 3)


def test_seq_examples_window_order_and_context(spark):
    from teleco_etl_pipeline_spark.plans.events import q_events_seq_examples
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 7, t, 1.0, "{}")
        for i, t in enumerate(["a", "b", "c", "d", "e"])
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet("/tmp/seq_ev/events.parquet")
    got = {
        r["target"]: r["context"]
        for r in q_events_seq_examples(spark, "/tmp/seq_ev").collect()
    }
    # first 3 events lack a full context; contexts are in event order
    assert got == {"d": "a|b|c", "e": "b|c|d"}


def test_hll_sketch_rollup_merges_daily_partials(spark, sf_dir):
    """Mergeable-sketch rollup: per-day Datasketches HLL partials
    union to the corpus estimate WITHOUT rescanning events — the
    100 TB pattern for distinct-over-any-date-range dashboards
    (store tiny daily sketch blobs, merge at query time). The merged
    estimate must track exact countDistinct within HLL error."""
    import os

    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    exact = ev.agg(F.count_distinct("user_id").alias("n")).collect()[0]["n"]
    assert abs(merged - exact) <= max(3, 0.05 * exact), (merged, exact)
    # the partials are bounded-size binaries — what a metrics table
    # would persist per (day, dimension) cell
    sizes = daily.select(F.length("sk").alias("b")).collect()
    assert all(r["b"] < 20_000 for r in sizes)


def test_segment_blocked_linkage_complete_for_substitutions(spark, sf_dir):
    """Pigeonhole completeness: on the harness customers (fixed-format
    names, substitution-only dist-1 pairs) the segment-blocked
    candidate generation must find EXACTLY the pairs the naive
    unblocked all-pairs comparator finds within the same attribute
    blocks."""
    from pyspark.sql import functions as F

    from teleco_etl_pipeline_spark.plans.registry import all_queries
    from teleco_etl_pipeline_spark.sources.tables import load_table

    got = {
        (r["id_a"], r["id_b"], r["name_dist"])
        for r in all_queries()["customer_linkage_blocked"]
        .build(spark, sf_dir)
        .collect()
    }
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    a = cust.select(*[F.col(c).alias(f"a_{c}") for c in cust.columns])
    b = cust.select(*[F.col(c).alias(f"b_{c}") for c in cust.columns])
    naive = {
        (r["id_a"], r["id_b"], r["name_dist"])
        for r in a.join(
            b,
            (F.col("a_c_nationkey") == F.col("b_c_nationkey"))
            & (F.col("a_c_mktsegment") == F.col("b_c_mktsegment"))
            & (F.col("a_c_custkey") < F.col("b_c_custkey")),
        )
        .select(
            F.col("a_c_custkey").alias("id_a"),
            F.col("b_c_custkey").alias("id_b"),
            F.levenshtein("a_c_name", "b_c_name").alias("name_dist"),
        )
        .filter(F.col("name_dist") <= 1)
        .collect()
    }
    assert got == naive


def test_survival_curve_terminal_cell_hits_zero_in_both_engines(spark, tmp_path):
    """ADVICE r5 (medium): when the max-lifetime cell has d == n_risk
    (every remaining at-risk user churned), the KM product contains an
    exact zero factor — unguarded, DuckDB's LN(0) errors while Spark's
    F.log returns NULL (skipped by F.sum → stale positive survival).
    Both engines must now report survival = 0.0 for that cell, and
    agree on every other cell."""
    import datetime as dt
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    qs = all_queries()
    tf = dt.datetime(2024, 3, 1, 12, 0, 0)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: lifetime 5 days, last activity 5 days before the
        # frontier → UNCENSORED, and alone at the max lifetime ⇒ the
        # terminal cell has d == n_risk.
        (1, tf - 10 * day, 1),
        (2, tf - 5 * day, 1),
        # user 2: lifetime 0, 3 days stale → uncensored (d at t=0).
        (3, tf - 3 * day, 2),
        # user 3: defines the frontier → censored at t=0.
        (4, tf, 3),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    q = qs["user_survival_curve"]
    got = {
        r["t_days"]: (r["n_risk"], r["n_churned"], r["survival"])
        for r in q.build(spark, str(tmp_path)).collect()
    }
    # survival is now the RAW exact ordered product (no rounding):
    # the t=0 cell's single factor is the CR division (3-1)/3.
    assert got[0] == (3, 1, 2 / 3)
    assert got[5] == (1, 1, 0.0)  # terminal cell: exact zero, not stale 2/3
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    oracle = {
        int(t): (int(n), int(d), float(s))
        for t, n, d, s in con.execute(q.oracle).fetchall()
    }
    con.close()
    assert oracle == got


def test_pca_projection_matches_numpy(spark, sf_dir):
    """The baked-basis projection must track numpy's (v - mu) @ comps
    on the same fitted basis, and the components must be orthonormal
    with descending explained variance. Tolerance is 1e-4: the
    engine projection is the determinism-by-construction QUANTIZED
    dot (floor(x·1e6) integers, exact in any order), which shifts
    each pc by O(dim·1e-6) from the float64 value — the r7 tradeoff
    of drift-proof cross-engine ranking for a bounded bias."""
    import numpy as np

    from teleco_etl_pipeline_spark.operators.similarity import (
        _fit_sample,
        _pca_fit_from_sample,
        pca_project,
    )
    from teleco_etl_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    x = _fit_sample(emb, "vec_id", "embedding", 4096)
    mu, comps, evr = _pca_fit_from_sample(x, 2)
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-9)
    assert evr[0] >= evr[1] >= 0
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_project(emb, n_components=2).collect()
    }
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    want = (vecs - mu) @ comps.T
    for i, vid in enumerate(ids):
        assert abs(got[vid][0] - want[i, 0]) < 1e-4
        assert abs(got[vid][1] - want[i, 1]) < 1e-4


def test_sparse_tfidf_selfsim_and_bounds(spark, sf_dir):
    """Inverted-index TF-IDF retrieval: cosines in [0, 1], the query
    doc itself is excluded, and an exact-duplicate text (if present
    via templating) ranks at cosine ~1 above unrelated docs."""
    from teleco_etl_pipeline_spark.operators.freq import sparse_tfidf_topk
    from teleco_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = sparse_tfidf_topk(docs, query_doc_id=0, top_k=10).collect()
    assert rows and all(0.0 <= r["cosine"] <= 1.0 + 1e-9 for r in rows)
    assert all(r["doc_id"] != 0 for r in rows)
    # descending with id tie-breaks
    vals = [r["cosine"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_woe_iv_zero_cell_smoothing(spark, tmp_path):
    """A category with zero positives must produce a finite negative
    WOE (Laplace +0.5), never ln(0)/NULL."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from teleco_etl_pipeline_spark.plans.registry import all_queries

    pri = ["1-URGENT"] * 10 + ["2-HIGH"] * 10
    st = ["F"] * 10 + ["O"] * 10  # 2-HIGH has ZERO positives
    pq.write_table(
        pa.table({"o_orderpriority": pa.array(pri), "o_orderstatus": pa.array(st)}),
        os.path.join(str(tmp_path), "orders.parquet"),
    )
    out = {
        r["o_orderpriority"]: r
        for r in all_queries()["priority_woe_iv"].build(spark, str(tmp_path)).collect()
    }
    assert out["2-HIGH"]["n_pos"] == 0
    assert out["2-HIGH"]["woe"] is not None and out["2-HIGH"]["woe"] < 0
    assert out["1-URGENT"]["woe"] > 0
    assert all(r["iv_term"] >= 0 for r in out.values())


def test_bloom_pruned_join_properties(spark, sf_dir):
    """The Bloom pruning contract: no false negatives (every true
    match passes the filter — n_missed == 0 structurally), candidate
    superset bounded by the fact, and FP accounting consistent."""
    r = all_queries()["bloom_pruned_join"].build(spark, sf_dir).collect()[0]
    assert r["n_missed"] == 0
    assert r["n_matched"] <= r["n_candidates"] <= r["n_fact"]
    assert r["n_false_pos"] == r["n_candidates"] - r["n_matched"]
    # the filter must actually prune: a selective dim keeps the
    # candidate set a small fraction of the fact scan
    assert r["n_dim_keys"] > 0 and r["n_candidates"] < r["n_fact"] * 0.5


def test_bloom_prune_plans_broadcast_not_shuffle(spark, sf_dir):
    """Both joins must broadcast (the 1-row bitset and the FP-
    accounting dim) — the fact side is scanned once with no shuffle
    before the final 1-row aggregate."""
    plan = (
        all_queries()["bloom_pruned_join"]
        .build(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # dim FP-accounting join
    assert "SortMergeJoin" not in plan


def test_char_entropy_exact_on_hand_docs(spark):
    """Entropy micro-bit arithmetic pinned on closed-form docs:
    'aaaa' → 0 bits, 'abab' → 1 bit exactly (powers of two make the
    floor quantization lossless), 'abcd' → 2 bits; uniform bound
    H ≤ log2(distinct_chars)."""
    from teleco_etl_pipeline_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert out[1].entropy_ubits == 0
    assert out[1].distinct_chars == 1 and out[1].n_chars_seen == 4
    assert out[2].entropy_ubits == 1_000_000
    assert out[3].entropy_ubits == 2_000_000


def test_char_entropy_bounds_on_corpus(spark, sf_dir):
    import math

    from teleco_etl_pipeline_spark.plans.registry import all_queries

    rows = all_queries()["doc_char_entropy"].build(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.entropy_ubits
        # floor quantization only ever rounds DOWN, so the uniform
        # bound holds with no tolerance
        assert r.entropy_ubits <= math.log2(r.distinct_chars) * 1e6 + 1
        assert r.distinct_chars <= r.n_chars_seen


def test_markov_stationary_two_state_alternator(spark):
    """A deterministic a↔b alternator has stationary (1/2, 1/2): the
    integer power iteration must preserve the exact split (weights
    are exactly 1e6, so no floor loss)."""
    import datetime as dt

    from pyspark.sql import Row

    from teleco_etl_pipeline_spark.plans import events as events_plan  # noqa: F401
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            ts=base + dt.timedelta(minutes=i),
            user_id=1,
            event_type="a" if i % 2 == 0 else "b",
            value=1.0,
            props="{}",
        )
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = (
            all_queries()["events_markov_stationary"]
            .build(spark, d)
            .collect()
        )
    units = {r.event_type: r.stationary_units for r in out}
    assert units == {"a": 500_000_000_000, "b": 500_000_000_000}


def test_markov_stationary_mass_nearly_conserved(spark, sf_dir):
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    rows = (
        all_queries()["events_markov_stationary"].build(spark, sf_dir).collect()
    )
    total = sum(r.stationary_units for r in rows)
    # Floor losses only, dominated by the row-stochastic weight
    # quantization: each out-row's Σ_b w_ab falls short of 1e6 by at
    # most #states floors → relative mass loss ≤ states/1e6 per
    # iteration (plus ≤1 unit per edge-division). 3 iterations over
    # a ≤25-state graph: ≥ (1 − 25e-6)³ of the initial 1e12.
    assert 10**12 * (1 - 25e-6) ** 3 - 200 <= total <= 10**12
    assert all(r.stationary_units > 0 for r in rows)


def _write_events(spark, tmpdir, rows):
    import datetime as dt

    from pyspark.sql import Row

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=base + dt.timedelta(seconds=s),
                user_id=u,
                event_type=t,
                value=1.0,
                props="{}",
            )
            for i, (s, u, t) in enumerate(rows)
        ]
    )
    df.write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")


def test_burst_report_hand_fixture(spark, tmp_path):
    """One user, type 'a' at t, t+30s, t+2h: 2 gaps, one within both
    thresholds, min gap 30 s. Thresholds are cumulative
    (within_1m ⊆ within_1h)."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    _write_events(
        spark, tmp_path, [(0, 1, "a"), (30, 1, "a"), (7230, 1, "a")]
    )
    rows = (
        all_queries()["events_burst_report"]
        .build(spark, str(tmp_path))
        .collect()
    )
    r = rows[0]
    assert (r.n_events, r.n_gaps) == (3, 2)
    assert (r.n_within_1m, r.n_within_1h) == (1, 1)
    assert r.min_gap_s == 30


def test_arrival_dispersion_closed_forms(spark, tmp_path):
    """Uniform 1/hour → variance 0 → D = 0; two 5-event bursts with
    an empty hour between → D = (3·50 − 100)/(10·2) = 2.5 exactly
    (the span algebra counts the empty hour as a zero)."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    uniform = [(h * 3600, 1, "u") for h in range(5)]
    bursts = [(0, 2, "b")] * 5 + [(2 * 3600, 2, "b")] * 5
    _write_events(spark, tmp_path, uniform + bursts)
    out = {
        r.event_type: r
        for r in all_queries()["events_arrival_dispersion"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert out["u"].span_hours == 5 and abs(out["u"].dispersion) < 1e-6
    b = out["b"]
    assert (b.span_hours, b.observed_hours, b.n_events) == (3, 2, 10)
    assert abs(b.dispersion - 2.5) < 1e-6


def test_calendar_gap_hand_fixture_and_invariants(spark, tmp_path, sf_dir):
    """Days {1,2,5} → span 5, active 3, missing 2, longest gap 2;
    then invariants on the real orders table."""
    import datetime as dt

    from pyspark.sql import Row

    from teleco_etl_pipeline_spark.plans.registry import all_queries

    rows = [
        Row(
            o_orderkey=i,
            o_custkey=1,
            o_orderstatus="O",
            o_totalprice=1.0,
            o_orderdate=dt.date(2024, 1, d),
            o_orderpriority="1-URGENT",
            o_clerk="c",
            o_shippriority=0,
            o_comment="",
        )
        for i, d in enumerate([1, 2, 5])
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    r = (
        all_queries()["orders_calendar_gap_report"]
        .build(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r.span_days, r.active_days, r.missing_days) == (5, 3, 2)
    assert r.longest_gap_days == 2
    assert (r.first_day, r.last_day) == ("2024-01-01", "2024-01-05")

    for row in (
        all_queries()["orders_calendar_gap_report"]
        .build(spark, sf_dir)
        .collect()
    ):
        assert row.active_days + row.missing_days == row.span_days
        assert 0 <= row.longest_gap_days <= row.missing_days
        assert row.first_day <= row.last_day


def test_dispersion_single_hour_span_is_zero_not_nan(spark, tmp_path):
    """All events in ONE epoch-hour bucket: variance is undefined
    (span 1) — both engines must emit the 0.0 sentinel, never 0/0
    (Spark NULL vs DuckDB NaN was the unguarded divergence)."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    _write_events(spark, tmp_path, [(i, 1, "x") for i in range(5)])
    (r,) = (
        all_queries()["events_arrival_dispersion"]
        .build(spark, str(tmp_path))
        .collect()
    )
    assert r.span_hours == 1
    assert r.dispersion == 0.0


def test_markov_stationary_empty_when_no_transitions(spark, tmp_path):
    """Every user has a single event → zero transition pairs: the
    result is EMPTY (matching the oracle's CTE chain), not a
    ZeroDivisionError on the uniform-split constant."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    _write_events(spark, tmp_path, [(0, u, "a") for u in range(4)])
    out = (
        all_queries()["events_markov_stationary"]
        .build(spark, str(tmp_path))
        .collect()
    )
    assert out == []
