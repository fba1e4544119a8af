"""Frequency analytics: Misra-Gries heavy hitters + TF-IDF + canonical
near-dup selection (operators/freq.py, operators/dedup.py keep_best)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.operators.dedup import neardup_keep_best
from teleco_etl_pipeline_spark.operators.freq import (
    _merge_mg,
    heavy_hitter_tokens,
    misra_gries_candidates,
    tfidf_top_terms,
)
from teleco_etl_pipeline_spark.operators.text import tokens


def test_merge_mg_bounds_size_and_undercount():
    # Feed a known stream in two batches; the summary never exceeds k
    # counters and undercounts any item by at most n/(k+1).
    stream = ["a"] * 50 + ["b"] * 30 + ["c"] * 10 + [f"x{i}" for i in range(20)]
    k = 4
    half = len(stream) // 2
    counters: dict[str, int] = {}
    for part in (stream[:half], stream[half:]):
        batch: dict[str, int] = {}
        for t in part:
            batch[t] = batch.get(t, 0) + 1
        counters = _merge_mg(counters, batch, k)
    n = len(stream)
    assert len(counters) <= k
    for t, true_cnt in (("a", 50), ("b", 30)):
        assert t in counters
        assert counters[t] <= true_cnt
        assert true_cnt - counters[t] <= n / (k + 1)


@pytest.mark.parametrize("parts", [1, 3, 7])
def test_mg_candidates_superset_of_heavy_hitters(spark, parts):
    # Skewed corpus: "hot" dominates; rare tokens form a long tail.
    rows = [("hot " * 40 + f"rare{i} tail{i % 5}",) for i in range(60)]
    docs = spark.createDataFrame(rows, "text string")
    tok = docs.select(F.explode(tokens("text")).alias("token")).repartition(parts)
    n = tok.count()
    k = 10
    cand = {r.token for r in misra_gries_candidates(tok, k).distinct().collect()}
    truth = {
        r.token
        for r in tok.groupBy("token")
        .count()
        .filter(F.col("count") * (k + 1) > n)
        .collect()
    }
    assert truth <= cand, f"missing heavy hitters: {truth - cand}"


@pytest.mark.parametrize("parts", [1, 5])
def test_heavy_hitters_exact_vs_naive(spark, parts, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(parts)
    )
    k = 30
    got = {(r.token, r.cnt) for r in heavy_hitter_tokens(docs, k=k).collect()}
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    n = tok.count()
    want = {
        (r.token, r["count"])
        for r in tok.groupBy("token").count().filter(F.col("count") * k > n).collect()
    }
    assert got == want


def test_tfidf_top_terms_distinctive_token_wins(spark):
    # "zebra" appears only in doc 1 → highest idf there; "common" is
    # in every doc → lowest idf.
    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra common common"),
            (2, "apple apple common"),
            (3, "banana banana common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, top_n=1).collect()
    best = {r.doc_id: r.token for r in out}
    assert best == {1: "zebra", 2: "apple", 3: "banana"}


def test_tfidf_rank_window_bounds_rows(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a a")], "doc_id long, text string"
    )
    out = tfidf_top_terms(docs, top_n=3)
    per_doc = {r.doc_id: r["cnt"] for r in out.groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()}
    assert per_doc[1] == 3
    assert per_doc[2] == 1  # doc 2 has a single distinct token


def test_neardup_keep_best_picks_max_quality(spark):
    clusters = spark.createDataFrame(
        [
            (10, 10, 3, 0),
            (11, 10, 3, 0),
            (12, 10, 3, 0),
            (20, 20, 1, 1),
        ],
        "doc_id long, cluster_id long, cluster_size long, is_keeper int",
    )
    docs = spark.createDataFrame(
        [(10, 5), (11, 9), (12, 9), (20, 2)], "doc_id long, n_chars long"
    )
    out = {
        r.cluster_id: (r.doc_id, r.n_chars)
        for r in neardup_keep_best(clusters, docs).collect()
    }
    # Cluster 10: docs 11 and 12 tie on n_chars=9 → lowest id (11) wins.
    assert out == {10: (11, 9), 20: (20, 2)}


def test_neardup_keep_best_one_row_per_cluster(spark, sf_dir):
    from teleco_etl_pipeline_spark.operators.dedup import (
        neardup_clusters,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.12, max_shingle_freq=None)
    clusters = neardup_clusters(pairs, docs)
    kept = neardup_keep_best(clusters, docs)
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert kept.count() == n_clusters
    # Survivors are a subset of the corpus and unique per cluster.
    assert kept.select("cluster_id").distinct().count() == n_clusters


def test_locf_grid_fill_carries_through_gaps(spark):
    from teleco_etl_pipeline_spark.operators.temporal import locf_grid_fill

    day = 86_400_000_000
    ev = spark.createDataFrame(
        [
            # user 1: days 0 and 3 observed; 1, 2 are gaps; two events
            # on day 0 — later ts wins; day 4 global frontier from user 2
            (1, 0 * day + 10, 5.0, 100),
            (1, 0 * day + 20, 7.0, 101),
            (1, 3 * day + 5, 9.0, 102),
            (2, 4 * day + 1, 1.5, 103),
        ],
        "user_id long, ts_us long, value double, event_id long",
    )
    out = {
        (r.user_id, r.bucket): r.value_locf
        for r in locf_grid_fill(ev).collect()
    }
    assert out == {
        (1, 0): 7.0,  # closing value of day 0 (later ts), not 5.0
        (1, 1): 7.0,  # gap → carried
        (1, 2): 7.0,
        (1, 3): 9.0,
        (1, 4): 9.0,  # padded to the global frontier
        (2, 4): 1.5,
    }


def test_locf_tiebreak_on_equal_ts(spark):
    from teleco_etl_pipeline_spark.operators.temporal import locf_grid_fill

    ev = spark.createDataFrame(
        [(1, 50, 2.0, 7), (1, 50, 3.0, 9)],
        "user_id long, ts_us long, value double, event_id long",
    )
    rows = locf_grid_fill(ev).collect()
    assert len(rows) == 1 and rows[0].value_locf == 3.0  # higher event_id wins


def test_rolling_mean_over_grid_trailing_frame(spark):
    from teleco_etl_pipeline_spark.operators.temporal import (
        rolling_mean_over_grid,
    )

    grid = spark.createDataFrame(
        [(1, b, float(b)) for b in range(5)] + [(2, 0, 10.0)],
        "user_id long, bucket long, value_locf double",
    )
    out = {
        (r.user_id, r.bucket): r.rolling_mean
        for r in rolling_mean_over_grid(grid, window_buckets=3).collect()
    }
    assert out[(1, 0)] == 0.0
    assert out[(1, 1)] == 0.5          # mean(0,1)
    assert out[(1, 2)] == 1.0          # mean(0,1,2)
    assert out[(1, 4)] == 3.0          # mean(2,3,4) — frame slides
    assert out[(2, 0)] == 10.0         # keys isolated


def test_unigram_logprob_rare_tokens_score_higher(spark):
    from teleco_etl_pipeline_spark.operators.freq import unigram_logprob_score

    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common rare1 rare2"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.mean_bits for r in unigram_logprob_score(docs).collect()}
    # Doc 2 mixes in singleton tokens → higher mean surprisal.
    assert out[2] > out[1]
    # Doc 1 is all p=6/8 tokens: -log2(0.75) ≈ 0.415 bits.
    assert abs(out[1] - 0.415) < 0.001


def test_events_funnel_counts_ordered_conversions(spark, sf_dir):
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    row = all_queries()["events_funnel"].build(spark, sf_dir).collect()[0]
    assert row.n_click_users > 0
    assert 0 <= row.n_converted <= row.n_click_users
    assert abs(
        row.conv_rate_pct - round(100.0 * row.n_converted / row.n_click_users + 1e-9, 4)
    ) < 1e-6


def test_bigram_logprob_sequence_aware(spark):
    from teleco_etl_pipeline_spark.operators.freq import bigram_logprob_score

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # dominant alternating pattern
            (2, "a a b b a"),     # same vocab, unusual transitions
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.mean_bits for r in bigram_logprob_score(docs).collect()}
    assert out[2] > out[1]
    # corpus-wide counts: P(b|a)=4/5, P(a|b)=3/4 → doc 1 mean bits
    # = (3·lg(5/4) + 2·lg(4/3)) / 5 ≈ 0.3591
    assert abs(out[1] - 0.3591) < 0.001


def test_bigram_logprob_drops_single_token_docs(spark):
    from teleco_etl_pipeline_spark.operators.freq import bigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "only"), (2, "two tokens")], "doc_id long, text string"
    )
    rows = bigram_logprob_score(docs).collect()
    assert [r.doc_id for r in rows] == [2]


def test_weighted_sample_deterministic_and_exact_n(spark, sf_dir):
    from teleco_etl_pipeline_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = weighted_sample_without_replacement(docs, 25, "n_chars").collect()
    b = weighted_sample_without_replacement(docs.repartition(7), 25, "n_chars").collect()
    assert len(a) == 25
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # partition-invariant


def test_weighted_sample_key_monotone_in_weight(spark):
    from teleco_etl_pipeline_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    light = spark.createDataFrame([(i, 10) for i in range(50)], "doc_id long, n_chars long")
    heavy = spark.createDataFrame([(i, 1000) for i in range(50)], "doc_id long, n_chars long")
    kl = {r.doc_id: r.es_key for r in weighted_sample_without_replacement(light, 50, "n_chars").collect()}
    kh = {r.doc_id: r.es_key for r in weighted_sample_without_replacement(heavy, 50, "n_chars").collect()}
    # u^(1/w) is increasing in w for u in (0,1): same id, larger
    # weight -> key at least as large (rounded).
    assert all(kh[i] >= kl[i] for i in kl)


def test_sparse_tfidf_weight_sums_within_exact_int64_budget(spark, sf_dir):
    """Σw² per doc must stay far below 2^63: Spark sums the integer
    tf-idf weights as int64 (silent wrap past 2^63 in non-ANSI mode)
    while the oracle's BIGINT weights sum in HUGEINT — a margin audit
    on real testdata, the embedding-quantization-budget precedent
    (round-8 advice)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"), F.col("text")
    )
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    idf_q = F.floor((F.log((n_docs + 1) / (F.col("df") + 1)) + 1) * 1e3)
    w = tf.join(df_, "token").select((F.col("tf") * idf_q).alias("w"))
    max_den = (
        w.select((F.col("w") * F.col("w")).alias("ww"))
        .agg(F.sum("ww"))
        .first()[0]
    )
    # 2^63 with three orders of magnitude of headroom; the WHOLE
    # corpus' Σw² bounds any per-doc Σw².
    assert max_den < 2**63 / 1000


def test_collocation_pmi_matches_pure_python(spark, sf_dir):
    import os
    from collections import Counter

    import pytest as _pytest

    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        _pytest.skip("harness testdata absent")
    from teleco_etl_pipeline_spark.operators.freq import (
        _PMI_MIN_SUPPORT,
        _PMI_TOPK,
        q_collocation_pmi_topk,
    )

    got = [
        (r["w1"], r["w2"], r["c_ab"], r["lift"])
        for r in q_collocation_pmi_topk(spark, sf_dir).collect()
    ]
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).collect()
    uni, bi = Counter(), Counter()
    for r in docs:
        ws = r["text"].strip().split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n_uni = sum(uni.values())
    n_bi = sum(c for c in bi.values() if True)
    kept = {p: c for p, c in bi.items() if c >= _PMI_MIN_SUPPORT}
    n_bi = sum(kept.values())
    want = sorted(
        (
            (
                w1,
                w2,
                c,
                float(c) * (float(n_uni) * float(n_uni))
                / (float(n_bi) * (float(uni[w1]) * float(uni[w2]))),
            )
            for (w1, w2), c in kept.items()
        ),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:_PMI_TOPK]
    assert got == want
    # lift of a true collocation beats independence (lift > 1)
    assert all(t[3] > 1.0 for t in got)


def test_textrank_path_graph_center_wins(spark):
    """On a pure path corpus 'x y z', the center token y has degree 2
    vs 1 — TextRank must rank it first; symmetric ends tie and break
    alphabetically."""
    from teleco_etl_pipeline_spark.operators.freq import textrank_keywords

    docs = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    rows = textrank_keywords(docs, topk=3).collect()
    assert [r.token for r in rows] == ["y", "x", "z"]
    assert rows[0].rank_units > rows[1].rank_units
    assert rows[1].rank_units == rows[2].rank_units


def test_textrank_dedups_repeated_cooccurrence(spark):
    """Edges are DISTINCT pairs: repeating the same bigram must not
    change ranks (unweighted TextRank), while adding a NEW neighbor
    must raise the hub's rank."""
    from teleco_etl_pipeline_spark.operators.freq import textrank_keywords

    once = textrank_keywords(
        spark.createDataFrame([(1, "x y z")], ["doc_id", "text"]), topk=3
    ).collect()
    rep = textrank_keywords(
        spark.createDataFrame([(1, "x y x y z")], ["doc_id", "text"]),
        topk=3,
    ).collect()
    assert [(r.token, r.rank_units) for r in once] == [
        (r.token, r.rank_units) for r in rep
    ]


def test_textrank_empty_graph_returns_empty(spark):
    """Single-token docs build zero co-occurrence edges: empty result
    (matching the oracle), not ZeroDivisionError."""
    from teleco_etl_pipeline_spark.operators.freq import textrank_keywords

    docs = spark.createDataFrame([(1, "solo"), (2, "")], ["doc_id", "text"])
    assert textrank_keywords(docs, topk=5).collect() == []
