"""BPE merge induction (operators/bpe.py) vs the textbook algorithm
(Sennrich et al. ACL'16) implemented independently in pure Python —
including the greedy-pairing edge case (symbol runs) the delimited-
string replace has to get right."""

from __future__ import annotations

import os
from collections import Counter, defaultdict

import pytest

from teleco_etl_pipeline_spark.operators.bpe import (
    _N_MERGES,
    _TOP_TOKENS,
    bpe_learn_frame,
    q_bpe_learn_merges,
)


def _python_bpe(word_freq, n_merges):
    """Textbook BPE: argmax pair (count desc, pair-string asc over the
    '|x||y|' spelling used by the SQL for an identical tie-break),
    greedy left-to-right merge application on symbol lists."""
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in vocab.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], f"|{p[0]}||{p[1]}|"))
        merges.append((pair, counts[pair]))
        merged = pair[0] + pair[1]
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    tok_counts = defaultdict(int)
    for w, syms in vocab.items():
        for s in syms:
            tok_counts[s] += word_freq[w]
    return merges, tok_counts


def _run_query_on_texts(spark, texts):
    d = spark.createDataFrame([(t,) for t in texts], "text string")
    return bpe_learn_frame(spark, d).collect()


def _check_against_python(rows, texts):
    word_freq = Counter(
        w for t in texts for w in t.strip().split() if w and "|" not in w
    )
    merges, tok_counts = _python_bpe(word_freq, _N_MERGES)
    got_merges = [
        (r["item"], r["weight"]) for r in rows if r["kind"] == "merge"
    ]
    assert got_merges == [(a + b, c) for (a, b), c in merges]
    want_top = sorted(tok_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_TOP_TOKENS
    ]
    got_top = [(r["item"], r["weight"]) for r in rows if r["kind"] == "token"]
    assert got_top == want_top


def test_bpe_greedy_run_pairing(spark):
    # 'aaaa' must merge to [aa][aa] (count 2·freq), 'aaaaa' to
    # [aa][aa][a] — the leftmost-non-overlapping semantics.
    texts = ["aaaa aaaa aaaaa b b b", "aaaa ab ba"]
    _check_against_python(_run_query_on_texts(spark, texts), texts)


def test_bpe_merged_symbol_participates_in_later_merges(spark):
    # 'st' should win merge 1, then 'est'/'st…' compounds become
    # available — round 2 counts pairs over the POST-merge encoding.
    texts = ["best rest test best rest test nest", "st st best"]
    _check_against_python(_run_query_on_texts(spark, texts), texts)


def test_bpe_on_corpus_matches_python(spark, sf_dir):
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        pytest.skip("harness testdata absent")
    rows = q_bpe_learn_merges(spark, sf_dir).collect()
    texts = [
        r["text"]
        for r in spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).collect()
    ]
    _check_against_python(rows, texts)


def test_bpe_encode_docs_matches_python(spark, sf_dir):
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        pytest.skip("harness testdata absent")
    from teleco_etl_pipeline_spark.operators.bpe import q_bpe_encode_docs

    got = {r["doc_id"]: r for r in q_bpe_encode_docs(spark, sf_dir).collect()}
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).collect()
    word_freq = Counter(
        w for r in docs for w in r["text"].strip().split() if w and "|" not in w
    )
    _merges, _ = _python_bpe(word_freq, _N_MERGES)
    # re-apply the learned merges to get per-word token counts
    vocab = {w: list(w) for w in word_freq}
    for (a, b), _c in _merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    for r in docs:
        words = [w for w in r["text"].strip().split() if w and "|" not in w]
        row = got[r["doc_id"]]
        assert row["n_words"] == len(words)
        assert row["n_chars"] == sum(len(w) for w in words)
        assert row["n_bpe_tokens"] == sum(len(vocab[w]) for w in words)
        assert row["n_bpe_tokens"] <= row["n_chars"]  # merges only shrink


def test_bpe_artifact_roundtrip_and_stored_encode(spark, sf_dir, tmp_path):
    # Artifact lifecycle: save -> latest-wins resolve -> load must
    # reproduce the trainer's merge list exactly, and encoding from
    # ONLY the stored table must equal the in-plan trainer's encode.
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        pytest.skip("harness testdata absent")
    from teleco_etl_pipeline_spark.operators.bpe import (
        _train,
        latest_merge_table,
        load_merge_table,
        q_bpe_encode_docs,
        q_bpe_encode_stored,
        save_merge_table,
    )
    from teleco_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("text")
    art = str(tmp_path)
    save_merge_table(spark, docs, art, version="20240101")
    save_merge_table(spark, docs, art, version="20240202")
    path = latest_merge_table(art)
    assert path.endswith("bpe_merges_20240202")  # dated latest wins
    # Natural-numeric resolution: v10 must beat v9 (plain
    # lexicographic sort got this wrong — r9 ADVICE), and a later
    # dated version still beats both.
    import os as _os

    for v in ("v9", "v10"):
        _os.makedirs(_os.path.join(art, f"bpe_merges_{v}"), exist_ok=True)
    assert latest_merge_table(art).endswith("bpe_merges_v10")
    for v in ("v9", "v10"):
        _os.rmdir(_os.path.join(art, f"bpe_merges_{v}"))
    loaded = load_merge_table(spark, path)
    _enc, trained = _train(spark, docs, _N_MERGES)
    assert loaded == [(i, pair, merged) for i, merged, pair, _c in trained]
    stored = sorted(
        tuple(r) for r in q_bpe_encode_stored(spark, sf_dir).collect()
    )
    inplan = sorted(
        tuple(r) for r in q_bpe_encode_docs(spark, sf_dir).collect()
    )
    assert stored == inplan


def test_session_artifact_store_fits_once():
    # fit_once must run the trainer exactly once per (kind, sf_dir)
    # per process, return a stable directory under the session root,
    # and record the fit wall-clock for bench.py's separate report.
    from teleco_etl_pipeline_spark.operators import artifacts

    artifacts.reset_for_tests()
    calls = []

    def fake_fit(adir):
        calls.append(adir)

    d1 = artifacts.fit_once("unit_kind", "/root/testdata/sf0.001", fake_fit)
    d2 = artifacts.fit_once("unit_kind", "/root/testdata/sf0.001", fake_fit)
    assert d1 == d2 and len(calls) == 1
    assert d1.startswith(artifacts.session_artifacts_dir())
    # a different sf_dir is a different artifact
    d3 = artifacts.fit_once("unit_kind", "/root/testdata/sf0.01", fake_fit)
    assert d3 != d1 and len(calls) == 2
    fits = artifacts.fit_seconds()
    assert "unit_kind@sf0.001" in fits and "unit_kind@sf0.01" in fits
    artifacts.reset_for_tests()


def test_incremental_index_dedup_fits_once(spark):
    # The registered stored-index dedup must train the signature
    # index exactly once per (process, sf_dir): the second build
    # reuses the artifact directory (serve-only path).
    from teleco_etl_pipeline_spark.operators import artifacts
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    artifacts.reset_for_tests()
    q = all_queries()["incremental_index_dedup"]
    sf = "/root/testdata/sf0.001"
    r1 = sorted(tuple(r) for r in q.build(spark, sf).collect())
    assert ("minhash_sigs@sf0.001" in artifacts.fit_seconds())
    n_fits = len(artifacts.fit_seconds())
    r2 = sorted(tuple(r) for r in q.build(spark, sf).collect())
    assert len(artifacts.fit_seconds()) == n_fits  # no re-fit
    assert r1 == r2
    artifacts.reset_for_tests()


def test_latest_artifact_resolution_edge_cases(tmp_path):
    # Natural-numeric: v10 > v9; padded-vs-unpadded digit-key
    # collisions (v1 vs v0001) resolve deterministically by the raw
    # name tiebreak, never by os.listdir order; empty dir raises the
    # diagnostic error, not IndexError.
    import os

    import pytest as _pytest

    from teleco_etl_pipeline_spark.operators.artifacts import (
        latest_artifact,
    )

    d = str(tmp_path)
    with _pytest.raises(FileNotFoundError):
        latest_artifact(d, "x_")
    for v in ("v9", "v10", "v1", "v0001"):
        os.makedirs(os.path.join(d, f"x_{v}"))
    assert latest_artifact(d, "x_").endswith("x_v10")
    os.rmdir(os.path.join(d, "x_v10"))
    os.rmdir(os.path.join(d, "x_v9"))
    # v1 vs v0001: identical digit keys -> raw-name tiebreak (v1)
    assert latest_artifact(d, "x_").endswith("x_v1")
