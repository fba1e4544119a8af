"""Drift screens + resampling inference (plans/drift.py) and HITS
(operators/graph.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.registry import all_queries


def test_psi_zero_when_periods_identical(spark, sf_dir):
    # PSI terms computed between a distribution and itself are ~0:
    # feed the registered query's machinery indirectly by checking
    # the property on its output — each |psi_term| is bounded by the
    # worst smoothed-rate ratio, and the total is finite and small
    # for TPC-H-ish uniform order prices (both periods draw from the
    # same generator).
    out = (
        all_queries()["totalprice_psi_drift"]
        .build(spark, sf_dir)
        .collect()
    )
    assert len(out) == 10
    assert [r.bin for r in out] == list(range(10))
    # every order lands in exactly one bin
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_base + r.n_curr for r in out) == n_orders
    total_psi = sum(r.psi_term for r in out)
    # same generator both periods => no real drift
    assert abs(total_psi) < 0.1


def test_psi_detects_injected_shift():
    # Textbook sanity on the PSI formula itself: a mass moving from
    # one bin to another produces a positive total.
    def term(na, nb, ta, tb):
        pa = (na + 0.5) / (ta + 5.0)
        pb = (nb + 0.5) / (tb + 5.0)
        return (pb - pa) * math.log(pb / pa)

    same = sum(term(100, 100, 1000, 1000) for _ in range(10))
    shifted = term(100, 400, 1000, 1000) + term(100, 0, 1000, 1000)
    assert abs(same) < 1e-12
    assert shifted > 0.5


def test_jsd_terms_nonnegative_and_bounded(spark, sf_dir):
    out = all_queries()["split_token_jsd"].build(spark, sf_dir).collect()
    assert out, "heavy-token gate should keep at least one token"
    for r in out:
        # per-token JSD contribution is >= 0 and <= ln2 * (p+q)/2
        assert r.jsd_term >= 0.0
        assert r.jsd_term <= math.log(2.0)
        assert r.n_train + r.n_test > 0
    # ordering contract: rounded term desc, token asc
    keys = [(-r.jsd_term, r.token) for r in out]
    assert keys == sorted(keys)


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    row = (
        all_queries()["poisson_bootstrap_ci"]
        .build(spark, sf_dir)
        .collect()[0]
    )
    assert row.n_replicates == 64
    assert row.ci_lo <= row.point_mean <= row.ci_hi
    # CI width is a few standard errors, not degenerate, not huge:
    # relative width under 20% for n >= 1500 orders.
    assert 0 < (row.ci_hi - row.ci_lo) < 0.2 * row.point_mean


def test_poisson_weights_mean_one(spark, sf_dir):
    # The Poisson(1) thresholds must give E[w] ~= 1 — i.e. each
    # replicate resamples ~N rows. Check per-replicate weight sums
    # are within 10% of N at sf0.001+.
    from teleco_etl_pipeline_spark.plans.drift import _POIS_T

    # threshold spacing reproduces the pmf within float tolerance
    p = [(_POIS_T[0]) / 2**32]
    for a, b in zip(_POIS_T, _POIS_T[1:]):
        p.append((b - a) / 2**32)
    expect = math.exp(-1.0)
    for k, pk in enumerate(p):
        assert abs(pk - expect) < 1e-6
        expect /= k + 1
    mean_w = sum(k * pk for k, pk in enumerate(p)) + 9 * (
        1 - _POIS_T[-1] / 2**32
    )
    assert abs(mean_w - 1.0) < 1e-4


def test_ccf_lag0_is_positive_and_symmetric_counts(spark, sf_dir):
    out = all_queries()["revenue_orders_ccf"].build(spark, sf_dir).collect()
    by_lag = {r.lag: r for r in out}
    assert set(by_lag) == set(range(-3, 4))
    # revenue and count on the same day co-move strongly
    assert by_lag[0].ccf > 0.5
    # pair counts at +k and -k are equal (same day-join, mirrored)
    for k in (1, 2, 3):
        assert by_lag[k].n_pairs == by_lag[-k].n_pairs


def test_hits_mutual_reinforcement_on_known_graph(spark):
    # Star-ish bipartite graph: supplier 1 is bought from by all
    # three customers, supplier 2 by customer 1 only => supplier 1
    # is the top authority; customer 1 buys from both suppliers =>
    # top hub.
    pairs = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (1, 2)], ["c", "s"]
    )
    pairs.createOrReplaceTempView("__hits_pairs")
    from teleco_etl_pipeline_spark.operators.graph import (
        _HITS_SCALE,
        _HITS_ITERS,
    )

    # run the same superstep recurrence inline
    hub = pairs.select("c").distinct().select(
        "c", F.lit(_HITS_SCALE).cast("long").alias("h")
    )
    auth = None
    for _ in range(_HITS_ITERS):
        araw = pairs.join(hub, "c").groupBy("s").agg(F.sum("h").alias("r"))
        tot = araw.agg(F.sum("r").alias("__t"))
        auth = araw.crossJoin(F.broadcast(tot)).select(
            "s",
            F.expr(f"r div greatest(1, __t div {_HITS_SCALE})").alias("a"),
        )
        hraw = pairs.join(auth, "s").groupBy("c").agg(F.sum("a").alias("r"))
        tot = hraw.agg(F.sum("r").alias("__t"))
        hub = hraw.crossJoin(F.broadcast(tot)).select(
            "c",
            F.expr(f"r div greatest(1, __t div {_HITS_SCALE})").alias("h"),
        )
    a = {r.s: r.a for r in auth.collect()}
    h = {r.c: r.h for r in hub.collect()}
    assert a[1] > a[2]
    assert h[1] > h[2] == h[3]


def test_hits_query_shape(spark, sf_dir):
    out = all_queries()["trade_graph_hits"].build(spark, sf_dir).collect()
    roles = [r.role for r in out]
    assert roles == sorted(roles)
    assert {r.role for r in out} == {"auth", "hub"}
    for role in ("auth", "hub"):
        scores = [r.score_units for r in out if r.role == role]
        assert len(scores) == 10
        assert scores == sorted(scores, reverse=True)
        assert all(s >= 0 for s in scores)
    # node labels carry the class prefix
    assert all(
        r.node.startswith("S" if r.role == "auth" else "C") for r in out
    )


def test_spearman_monotone_nonlinear_is_one(spark):
    # y = x^3 is monotone: Spearman rho = 1 while Pearson < 1.
    df = spark.createDataFrame(
        [(float(x), float(x**3), float(-x)) for x in range(1, 40)],
        ["l_quantity", "l_extendedprice", "l_discount"],
    )
    df.write.mode("overwrite").parquet("/tmp/__sp_li/lineitem.parquet")
    from teleco_etl_pipeline_spark.plans.registry import all_queries as q

    row = q()["lineitem_spearman_matrix"].build(spark, "/tmp/__sp_li").collect()[0]
    assert row.rho_qty_price == 1.0
    assert row.rho_qty_disc == -1.0
    assert row.n_rows == 39


def test_spearman_ties_average_rank(spark):
    # all-equal column: zero variance -> NaN guard? the data has ties
    # but non-degenerate columns must stay in [-1, 1]
    out = all_queries()["lineitem_spearman_matrix"]
    # covered at sf_dir scale in the oracle sweep; here bound check
    row = out.build(spark, "/root/testdata/sf0.001").collect()[0]
    for c in ("rho_qty_price", "rho_qty_disc", "rho_price_disc"):
        assert -1.0 <= getattr(row, c) <= 1.0


def test_hbos_flags_rare_combination(spark, sf_dir):
    out = all_queries()["orders_hbos_outliers"].build(spark, sf_dir).collect()
    assert len(out) == 20
    scores = [r.hbos for r in out]
    assert scores == sorted(scores, reverse=True)
    # HBOS over 10 price bins x priorities x 12 months: max possible
    # score is ln(N)*3; all scores positive and below that bound
    import math

    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert all(0 < s <= 3 * math.log(n) + 1e-6 for s in scores)


def test_centroid_drift_small_on_random_split(spark, sf_dir):
    out = (
        all_queries()["embedding_centroid_drift"].build(spark, sf_dir).collect()
    )
    assert out, "every label should have both splits at sf>=0.001"
    for r in out:
        assert r.n_train > 0 and r.n_test > 0
        # a hash split samples ONE population: centroid distance is
        # sampling noise — with only a handful of test-split vectors
        # per label at sf0.001 that noise is O(sigma*sqrt(d/n)) ~ 0.5,
        # still far below the ~8.5 maximum for |x| <= 0.53 in 64 dims
        assert 0.0 <= r.centroid_dist < 1.5


def test_centroid_drift_detects_injected_shift(spark):
    import numpy as np
    from teleco_etl_pipeline_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F

    ids = spark.range(0, 4000).select(
        "id", hash_bucket(F.col("id")).alias("b")
    )
    train_ids = [r.id for r in ids.filter("b < 800000").limit(50).collect()]
    test_ids = [r.id for r in ids.filter("b >= 900000").limit(50).collect()]
    rows = [(int(i), [0.1] * 8, 1) for i in train_ids]
    # test split shifted by +0.3 in every component -> dist ~ sqrt(8)*0.3
    rows += [(int(i), [0.4] * 8, 1) for i in test_ids]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    df.selectExpr(
        "vec_id", "CAST(embedding AS array<float>) AS embedding", "label"
    ).write.mode("overwrite").parquet("/tmp/__cdrift/embeddings.parquet")
    out = (
        all_queries()["embedding_centroid_drift"]
        .build(spark, "/tmp/__cdrift")
        .collect()
    )
    assert len(out) == 1
    expect = (8 * 0.3**2) ** 0.5
    assert abs(out[0].centroid_dist - expect) < 1e-3
