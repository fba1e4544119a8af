"""Property-based tests (hypothesis) for the invariants the engine's
correctness leans on: merge idempotence, chunk tiling, and
append-stable splits. Examples are kept small — each one runs real
Spark jobs — but the generators cover edge shapes (empty docs,
single tokens, NULL keys) that fixed fixtures miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.operators.sampling import deterministic_split
from teleco_etl_pipeline_spark.operators.text import chunk_documents
from teleco_etl_pipeline_spark.operators.upsert import merge_upsert

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Keyed tables: unique (possibly NULL) int keys -> short string values.
keyed_rows = st.dictionaries(
    st.one_of(st.none(), st.integers(0, 9)), st.text("ab", max_size=2), max_size=6
)


@given(target=keyed_rows, source=keyed_rows)
@settings(**SETTINGS)
def test_merge_upsert_idempotent_and_total(spark, target, source):
    t = spark.createDataFrame(list(target.items()), "id int, v string")
    s = spark.createDataFrame(list(source.items()), "id int, v string")
    once = merge_upsert(t, s, keys=["id"])
    twice = merge_upsert(once, s, keys=["id"])
    got_once = {r["id"]: r["v"] for r in once.collect()}
    got_twice = {r["id"]: r["v"] for r in twice.collect()}
    # Idempotent, and the merge is total: every key from either side
    # appears exactly once, source winning on conflicts.
    assert got_once == got_twice
    expect = dict(target)
    expect.update(source)
    assert got_once == expect


@given(
    n_tokens=st.lists(st.integers(1, 40), min_size=1, max_size=4),
    chunk=st.integers(2, 10),
    overlap=st.integers(0, 5),
)
@settings(**SETTINGS)
def test_chunk_documents_tiles_every_token(spark, n_tokens, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(n_tokens)],
        ["doc_id", "text"],
    )
    rows = chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(n_tokens):
        spans = sorted(
            (r["start_token"], r["n_chunk_tokens"]) for r in by_doc[i]
        )
        # Starts advance by exactly the stride and the chunks cover
        # [0, n) with no gap: each next start is inside (or at the
        # edge of) the previous chunk's span.
        assert spans[0][0] == 0
        for (s0, l0), (s1, _) in zip(spans, spans[1:]):
            assert s1 == s0 + stride
            assert s1 <= s0 + l0
        last_start, last_len = spans[-1]
        assert last_start + last_len == n or (n <= chunk and last_len == n)


@given(extra=st.lists(st.integers(1000, 1100), unique=True, max_size=5))
@settings(**SETTINGS)
def test_split_assignment_stable_under_append(spark, extra):
    base = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    before = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(base, "doc_id", fr).collect()
    }
    grown = base.unionByName(
        spark.createDataFrame([(e,) for e in extra] or [(9999,)], ["doc_id"])
    )
    after = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(grown, "doc_id", fr).collect()
    }
    # Appending rows never moves an existing row across splits.
    assert all(after[k] == v for k, v in before.items())


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    ),
    min_freq=st.integers(2, 4),
)
@settings(**SETTINGS)
def test_frequent_ngram_scrub_matches_python_reference(spark, docs, min_freq):
    """The scrub equals a direct Python re-implementation on random
    tiny corpora — covers overlap/edge shapes (empty docs, docs
    shorter than n, gram chains) the crafted fixtures don't."""
    from collections import Counter

    from teleco_etl_pipeline_spark.operators.dedup import frequent_ngram_scrub

    n = 2  # small corpora need bigrams to produce frequent spans
    texts = [" ".join(d) for d in docs]
    sdf = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["scrubbed_text"], r["n_removed"])
        for r in frequent_ngram_scrub(sdf, n=n, min_freq=min_freq).collect()
    }

    # Reference: same whitespace tokenization (split('\s+') of the
    # trimmed text — an empty doc yields one '' token, like Spark).
    toks_by_doc = [t.strip().split() if t.strip() else [""] for t in texts]
    counts = Counter(
        " ".join(tk[i : i + n])
        for tk in toks_by_doc
        for i in range(len(tk) - n + 1)
    )
    frequent = {g for g, c in counts.items() if c >= min_freq}
    for doc_id, tk in enumerate(toks_by_doc):
        covered = set()
        for i in range(len(tk) - n + 1):
            if " ".join(tk[i : i + n]) in frequent:
                covered.update(range(i, i + n))
        kept = [w for i, w in enumerate(tk) if i not in covered]
        assert got[doc_id] == (" ".join(kept), len(tk) - len(kept)), (
            doc_id,
            texts[doc_id],
        )
