"""Deterministic sampling/split/mix + PII redaction operators.

The correctness properties that matter for corpus builds:
- split assignment is a pure function of the key (append-stable, so
  growing the corpus never moves a row across splits);
- stratified sampling hits the requested rate within binomial noise
  and is independent of the strata;
- balanced_mix equalizes per-source volume;
- redaction removes every match of every pattern.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.operators.sampling import (
    balanced_mix,
    deterministic_split,
    hash_bucket,
    stratified_sample,
)
from teleco_etl_pipeline_spark.operators.text import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)

@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_fractions_and_disjointness(spark, docs):
    out = deterministic_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    counts = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    n = sum(counts.values())
    assert n == docs.count()
    # 80/10/10 within generous binomial noise for a small corpus.
    assert abs(counts.get("train", 0) / n - 0.8) < 0.1
    assert counts.get("valid", 0) > 0 and counts.get("test", 0) > 0


def test_split_is_append_stable(spark, docs):
    """Assignment computed on a subset equals assignment computed on
    the full corpus — the no-leakage property."""
    splits = {"train": 0.8, "valid": 0.1, "test": 0.1}
    full = deterministic_split(docs, "doc_id", splits).select("doc_id", "split")
    subset = deterministic_split(
        docs.filter(F.col("doc_id") % 3 == 0), "doc_id", splits
    ).select("doc_id", F.col("split").alias("split_sub"))
    joined = full.join(subset, "doc_id")
    assert joined.filter(F.col("split") != F.col("split_sub")).count() == 0


def test_split_fractions_must_sum_to_one(docs):
    with pytest.raises(ValueError):
        deterministic_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_stratified_sample_rate_and_salt_independence(spark, docs):
    kept = stratified_sample(docs, "doc_id", 0.3, salt="samp")
    rate = kept.count() / docs.count()
    assert 0.2 < rate < 0.4
    # A different salt draws a genuinely different subset.
    other = stratified_sample(docs, "doc_id", 0.3, salt="other")
    a = {r[0] for r in kept.select("doc_id").collect()}
    b = {r[0] for r in other.select("doc_id").collect()}
    assert a != b


def test_hash_bucket_range(spark):
    df = spark.range(1000).select(hash_bucket(F.col("id"), buckets=100).alias("b"))
    mn, mx = df.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx <= 99


def test_balanced_mix_equalizes_sources(spark, docs):
    mixed = balanced_mix(docs, "doc_id", "source")
    per_src = [r["n"] for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()]
    orig_min = docs.groupBy("source").count().agg(F.min("count")).first()[0]
    # Every source lands within noise of the smallest source's count.
    assert max(per_src) <= 2 * orig_min
    assert min(per_src) >= 1


def test_redact_pii_removes_every_pattern(spark):
    rows = [
        ("mail me at alice.smith+x@example.co.uk today",),
        ("call 555-867-5309 or 415.555.1234 now",),
        ("account 12345678 balance",),
        ("clean text stays clean",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    out = df.select(
        redact_pii("text").alias("clean"), *pii_counts("text")
    ).collect()
    for r in out:
        for _, pat, _ in PII_PATTERNS:
            import re

            assert not re.search(pat, r["clean"]), (pat, r["clean"])
    # Counts hit the expected matches.
    assert out[0]["n_email"] == 1
    assert out[1]["n_phone"] == 2
    assert out[2]["n_idnum"] == 1
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_idnum"] == 0
    # Placeholders actually landed.
    assert "<EMAIL>" in out[0]["clean"]
    assert "<PHONE>" in out[1]["clean"]
    assert "<ID>" in out[2]["clean"]


def test_sampled_guard_finds_heavy_shingles(spark):
    """The md5-sample frequency estimator must drop a clear stop-
    shingle (present in every doc) exactly like the exact counter."""
    from teleco_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    # 40 docs sharing one stop phrase + unique tails; two true
    # near-dups that only agree beyond the stop phrase.
    stop = "the quick brown fox jumps over"
    rows = [(i, f"{stop} unique tail {i} alpha beta gamma {i}") for i in range(40)]
    rows.append((100, "real duplicate content here repeated words exact match body"))
    rows.append((101, "real duplicate content here repeated words exact match body x"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # threshold=0.15 is LOW enough that, unguarded, the stop phrase
    # alone pairs every tail doc with every other (jaccard ≈ 0.25) —
    # so the assertions below prove the guard changed the outcome.
    unguarded = ngram_jaccard_pairs(
        docs, n=3, threshold=0.15, max_shingle_freq=None
    ).count()
    assert unguarded > 100  # stop-phrase explosion without the guard
    exact = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.15, max_shingle_freq=0.5, min_guard_floor=2
        ).collect()
    }
    sampled = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.15, max_shingle_freq=0.5,
            guard_sample_fraction=0.5, min_guard_floor=2,
        ).collect()
    }
    assert (100, 101) in exact
    assert (100, 101) in sampled
    # The stop-phrase-only docs must not pair up under either guard.
    assert all(a >= 100 for a, _ in exact)
    assert all(a >= 100 for a, _ in sampled)


def test_fractional_guard_validates_range(spark):
    from teleco_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fractional max_shingle_freq"):
        ngram_jaccard_pairs(docs, max_shingle_freq=1.5)


def test_pack_context_windows_sequential_within_shard(spark):
    from teleco_etl_pipeline_spark.operators.sampling import pack_context_windows

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([5, 3, 4, 6, 2])],
        ["doc_id", "text"],
    )
    rows = sorted(
        pack_context_windows(docs, budget_tokens=8, n_shards=1).collect(),
        key=lambda r: r["doc_id"],
    )
    # Single shard -> one concatenated stream cut every 8 tokens:
    # starts 0,5,8,12,18 -> windows 0,0,1,1,2; offsets 0,5,0,4,2.
    assert [r["shard"] for r in rows] == [0] * 5
    assert [(r["window_id"], r["offset_in_window"]) for r in rows] == [
        (0, 0), (0, 5), (1, 0), (1, 4), (2, 2)
    ]
    # Start offsets reconstruct the exact running token stream.
    starts = [r["window_id"] * 8 + r["offset_in_window"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert starts == [sum(toks[:i]) for i in range(len(toks))]


def test_temperature_mix_flattens_and_keeps_tail(spark):
    import pytest

    from teleco_etl_pipeline_spark.operators.sampling import temperature_mix

    # 400 head rows vs 25 tail rows (16:1 skew).
    df = spark.createDataFrame(
        [(i, "head") for i in range(400)] + [(1000 + i, "tail") for i in range(25)],
        "doc_id long, grp string",
    )
    # α=1 is the natural distribution — nothing dropped.
    assert temperature_mix(df, "doc_id", "grp", alpha=1.0).count() == 425
    # α=0.5: tail kept 100% (rate 1.0), head at (25/400)^0.5 = 0.25.
    out = temperature_mix(df, "doc_id", "grp", alpha=0.5)
    per = {r["grp"]: r["cnt"] for r in out.groupBy("grp").count().withColumnRenamed("count", "cnt").collect()}
    rates = {
        r["grp"]: r["keep_rate"]
        for r in out.select("grp", "keep_rate").distinct().collect()
    }
    assert rates == {"head": 0.25, "tail": 1.0}
    assert per["tail"] == 25
    # md5 buckets are ~uniform: kept head count lands near 400·0.25.
    assert 60 <= per["head"] <= 140
    # α=0 is the uniform endpoint: head rate collapses to 25/400.
    r0 = {
        r["grp"]: r["keep_rate"]
        for r in temperature_mix(df, "doc_id", "grp", alpha=0.0)
        .select("grp", "keep_rate").distinct().collect()
    }
    assert r0 == {"head": 0.0625, "tail": 1.0}
    with pytest.raises(ValueError):
        temperature_mix(df, "doc_id", "grp", alpha=1.5)
