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


# SCD2 change logs: (key, eid, ts, value) with deliberate ts ties and
# value echoes; eids unique per log.
def _changes(draw):
    rows = draw(
        st.lists(
            st.tuples(
                st.integers(0, 2),        # key
                st.integers(0, 50),       # ts
                st.sampled_from("abc"),   # value
            ),
            min_size=1,
            max_size=12,
            # (key, ts) unique: with same-instant changes the output
            # interval order can't recover the eid sequence, so the
            # adjacent-versions-differ check would be ill-posed; the
            # duplicate-timestamp tie-break has its own unit test.
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    return [(k, i, ts, v) for i, (k, ts, v) in enumerate(rows)]


scd2_logs = st.composite(_changes)()


@given(log=scd2_logs, cut=st.integers(0, 12))
@settings(**SETTINGS)
def test_scd2_invariants_and_incremental_equivalence(spark, log, cut):
    """For ANY change log: (1) per key exactly one open version;
    (2) versions tile the timeline — each valid_to equals the next
    valid_from; (3) consecutive versions differ in value; (4) folding
    the log in two chunks through scd2_apply equals the one-shot
    rebuild. The random cut point exercises empty/full batches."""
    from teleco_etl_pipeline_spark.operators.scd import (
        OPEN_END_US,
        scd2_apply,
        scd2_from_changes,
    )

    cols = ["k", "eid", "ts_us", "v"]
    full_df = spark.createDataFrame(log, cols)
    dim = scd2_from_changes(full_df, ["k"], "ts_us", ["v"], "eid")
    rows = sorted(
        (r["k"], r["valid_from_us"], r["valid_to_us"], r["v"], r["is_current"])
        for r in dim.collect()
    )
    by_key: dict = {}
    for k, vf, vt, v, cur in rows:
        by_key.setdefault(k, []).append((vf, vt, v, cur))
    for k, vers in by_key.items():
        assert sum(1 for *_, cur in vers if cur) == 1, (k, vers)
        for (vf1, vt1, v1, _), (vf2, vt2, v2, _) in zip(vers, vers[1:]):
            assert vt1 == vf2, (k, vers)       # timeline tiles
            assert v1 != v2, (k, vers)         # no-op collapsed
        assert vers[-1][1] == OPEN_END_US

    # split-fold equivalence (batch 2 keys may echo batch 1 values)
    head, tail = log[:cut], log[cut:]
    # scd2_apply's watermark contract: tail must not predate a head
    # key's current version — enforce by construction
    if head and tail:
        last_ts = {}
        for k, _, ts, _ in head:
            last_ts[k] = max(last_ts.get(k, ts), ts)
        tail = [
            (k, eid, max(ts, last_ts.get(k, ts)), v) for k, eid, ts, v in tail
        ]
        full2 = spark.createDataFrame(head + tail, cols)
        expect = scd2_from_changes(full2, ["k"], "ts_us", ["v"], "eid")
    else:
        full2 = full_df
        expect = dim
    folded = scd2_from_changes(
        spark.createDataFrame(head, cols) if head else full2,
        ["k"], "ts_us", ["v"], "eid",
    )
    if head and tail:
        folded = scd2_apply(
            folded, spark.createDataFrame(tail, cols), ["k"], "ts_us", ["v"], "eid"
        )

    def canon(df):
        return sorted(tuple(r) for r in df.select(*expect.columns).collect())

    assert canon(folded) == canon(expect)


@given(
    left=st.lists(st.integers(0, 40), min_size=1, max_size=8, unique=True),
    right=st.lists(st.integers(0, 40), max_size=8, unique=True),
)
@settings(**SETTINGS)
def test_asof_nearest_matches_pandas_merge_asof(spark, left, right):
    """asof_nearest_join ≡ pandas merge_asof(direction='nearest') on
    any tie-free single-key series (pandas breaks exact-distance ties
    forward; ours prefers backward — excluded by unique ts draws
    only when distances tie, so skip those probes)."""
    import pandas as pd

    from teleco_etl_pipeline_spark.operators.temporal import asof_nearest_join

    ldf = spark.createDataFrame(
        [(1, t, i, "x") for i, t in enumerate(sorted(left))],
        ["k", "ts_us", "eid", "tag"],
    )
    rdf = spark.createDataFrame(
        [(1, t, 100 + i, float(t)) for i, t in enumerate(sorted(right))],
        "k long, ts_us long, eid long, v double",
    )
    got = {
        r["ts_us"]: (r["nearest_v"], r["nearest_delta_us"])
        for r in asof_nearest_join(ldf, rdf, ["k"], "ts_us", "v", "eid").collect()
    }
    if not right:
        assert all(v == (-1.0, -1) for v in got.values())
        return
    pdl = pd.DataFrame({"ts_us": sorted(left)})
    pdr = pd.DataFrame({"ts_us": sorted(right), "v": [float(t) for t in sorted(right)]})
    ref = pd.merge_asof(pdl, pdr, on="ts_us", direction="nearest")
    for _, row in ref.iterrows():
        t = int(row["ts_us"])
        back = max((r for r in right if r <= t), default=None)
        fwd = min((r for r in right if r > t), default=None)
        if back is not None and fwd is not None and t - back == fwd - t:
            continue  # exact-distance tie: engines differ by convention
        assert got[t][0] == row["v"], (t, got[t], row["v"])
        assert got[t][1] == abs(int(row["v"]) - t)


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5)),  # (day offset, user)
        max_size=25,
    ),
    window=st.integers(1, 9),
)
@settings(**SETTINGS)
def test_trailing_distinct_matches_brute_force(spark, pairs, window):
    """trailing_distinct_count == the definitional brute force: for
    each observed day D, |{user : user active in (D-w, D]}|."""
    import datetime

    from teleco_etl_pipeline_spark.operators.temporal import (
        trailing_distinct_count,
    )

    base = datetime.date(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=d), u) for d, u in pairs]
    if not rows:
        return
    df = spark.createDataFrame(rows, "d date, user_id int")
    got = {
        r["d"]: r["n_distinct"]
        for r in trailing_distinct_count(df, "d", "user_id", window).collect()
    }
    days = sorted({d for d, _ in rows})
    expect = {
        day: len(
            {
                u
                for d, u in rows
                if day - datetime.timedelta(days=window - 1) <= d <= day
            }
        )
        for day in days
    }
    assert got == expect


@given(
    spends=st.lists(st.integers(1, 10_000), min_size=1, max_size=20),
)
@settings(**SETTINGS)
def test_pareto_abc_partitions_and_boundaries(spark, spends):
    """customer_pareto_abc invariants on arbitrary spend vectors: the
    classes partition all customers, shares sum to ~100, and the
    class of every customer matches the definitional inclusive
    cumulative-share rule computed exactly in Python."""
    from decimal import Decimal

    from pyspark.sql import Window

    rows = [(i, Decimal(s) / 100) for i, s in enumerate(spends)]
    df = spark.createDataFrame(rows, "o_custkey int, spend decimal(18,2)")
    total = sum(s for _, s in rows)
    w = Window.orderBy(F.desc("spend"), F.asc("o_custkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = df.withColumn("cum", F.sum("spend").over(w))
    cls_col = (
        F.when(F.lit(2) * F.col("cum") <= F.lit(total), "A")
        .when(F.lit(5) * F.col("cum") <= F.lit(4) * F.lit(total), "B")
        .otherwise("C")
    )
    got = {r["o_custkey"]: r["cls"] for r in cum.select("o_custkey", cls_col.alias("cls")).collect()}
    # python reference: same ordering, exact Decimal arithmetic
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    running = Decimal(0)
    expect = {}
    for k, s in order:
        running += s
        expect[k] = "A" if 2 * running <= total else ("B" if 5 * running <= 4 * total else "C")
    assert got == expect


# ---------------------------------------------------------------------------
# Cross-engine rounding discipline (round-5 regression class).
# ---------------------------------------------------------------------------

@given(
    mantissas=st.lists(st.integers(-2_000_000, 2_000_000), min_size=1, max_size=50),
)
@settings(**SETTINGS)
def test_round_half_away_matches_duckdb(mantissas):
    """_round_half_away must agree with DuckDB ROUND(x, 4) — the
    oracle's rounding — on arbitrary values INCLUDING exact decimal
    halves (k/2e4, where np.round's half-to-even diverges). This is
    the bug class behind round 5's one red driver row
    (embedding_knn_classify)."""
    import duckdb
    import numpy as np

    from teleco_etl_pipeline_spark.operators.similarity import _round_half_away

    # Mix arbitrary magnitudes with exact half-boundary values.
    vals = [m / 1e6 for m in mantissas] + [m / 2e4 for m in mantissas]
    x = np.array(vals, dtype=np.float64)
    got = _round_half_away(x, 4)
    con = duckdb.connect()
    expect = [
        con.execute("SELECT ROUND(?::DOUBLE, 4)", [float(v)]).fetchone()[0]
        for v in vals
    ]
    con.close()
    assert got.tolist() == expect


def test_python_kernels_never_use_np_round():
    """np.round is round-half-to-even; DuckDB/Spark ROUND are
    half-away-from-zero. Any np.round in a Python-side kernel that
    feeds a hashed/ranked column reintroduces the round-5 knn bug,
    so ban it from engine source outright (kernels inline the
    half-away formula; _round_half_away is the canonical helper)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parent.parent / "teleco_etl_pipeline_spark"
    offenders = []
    for py in pkg.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if re.search(r"\bnp\.(round|rint)\s*\(", code):
                offenders.append(f"{py.relative_to(pkg)}:{i}")
    assert not offenders, f"half-to-even rounding in engine kernels: {offenders}"


def test_inlined_kernel_rounding_matches_helper():
    """Any numpy kernel that must round half-away inlines the formula
    instead of importing the module helper (executor importability) —
    as of round 7 no similarity kernel rounds at all (quantized-exact
    keys), but the formula stays the canonical pattern for future
    kernels; pin that it IS _round_half_away, including on binary
    halves and negatives."""
    import numpy as np

    from teleco_etl_pipeline_spark.operators.similarity import _round_half_away

    rng = np.random.default_rng(7)
    x = np.concatenate(
        [
            rng.uniform(-1.5, 1.5, 500),
            np.arange(-40, 41) / 2e4,  # exact decimal halves
            np.array([0.0, -0.0, 1.0, -1.0]),
        ]
    )
    inlined = np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4
    assert np.array_equal(inlined, _round_half_away(x, 4))


# ---------------------------------------------------------------------------
# Determinism-by-construction kernels (round-7 exact-arithmetic class).
# These pin the three assumptions the PARITY.md audit leans on, WITHOUT
# Spark: (a) quantized dots are exact integers in float64, (b) the
# CR-sequence ranking key is bit-identical between DuckDB and plain
# Python floats, (c) DuckDB's list_reduce left fold is bit-identical
# to Python's reduce — the Kaplan-Meier ordered-product contract.
# ---------------------------------------------------------------------------


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-0.5, 0.5, allow_nan=False, width=32),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=2,
    ),
)
@settings(**SETTINGS)
def test_quantized_dot_is_exact_integer_in_float64(vecs):
    """floor(x·1e6) components: the float64 einsum dot must EQUAL the
    arbitrary-precision Python-int dot — the 'exact in any
    accumulation order' claim behind the kNN/TF-IDF/PCA ranking."""
    import numpy as np

    a = np.floor(np.array(vecs[0], dtype=np.float64) * 1e6)
    b = np.floor(np.array(vecs[1], dtype=np.float64) * 1e6)
    num_f = float(np.einsum("i,i->", a, b))
    num_i = sum(int(x) * int(y) for x, y in zip(a, b))
    assert num_f == float(num_i) and abs(num_i) < 2**53


@given(
    num=st.integers(-(10**14), 10**14),
    da=st.integers(1, 10**14),
    db=st.integers(1, 10**14),
)
@settings(**SETTINGS)
def test_cr_ranking_key_bit_identical_duckdb_vs_python(num, da, db):
    """The ranking key num/sqrt(double(da)·double(db)) is a fixed
    sequence of correctly-rounded IEEE ops — DuckDB must produce the
    bit-identical double to plain Python floats."""
    import math
    import struct

    import duckdb

    py = num / math.sqrt(float(da) * float(db))
    con = duckdb.connect()
    dk = con.execute(
        "SELECT CAST(? AS DOUBLE) / SQRT(CAST(? AS DOUBLE) * CAST(? AS DOUBLE))",
        [num, da, db],
    ).fetchone()[0]
    con.close()
    assert struct.pack(">d", py) == struct.pack(">d", dk)


@given(
    cells=st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 100)),
        min_size=1,
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_km_ordered_product_bit_identical_duckdb_vs_python(cells):
    """Kaplan-Meier factor fold: DuckDB list_reduce((a,b) -> a*b)
    over the ordered factor list must be bit-identical to Python's
    sequential product of the same CR-division factors — the ordered
    exact product contract of user_survival_curve."""
    import struct

    import duckdb

    # factors (n_risk - d)/n_risk with d < n_risk, like the guarded query
    factors = [(n - min(d, n - 1)) / n for d, n in cells]
    py = 1.0
    for f in factors:
        py = py * f
    con = duckdb.connect()
    # Elements as STRING→DOUBLE casts: DuckDB's bare decimal-literal
    # parse is not correctly rounded (can land 1 ulp off the nearest
    # double — found by THIS test), while its strtod is. The engine
    # oracles follow the same rule (operators/similarity.py:_sql_f);
    # in the real survival query the factors are computed in-engine
    # as native doubles and never pass through literals at all.
    lit = "[" + ", ".join(f"'{f!r}'::DOUBLE" for f in factors) + "]"
    dk = con.execute(
        f"SELECT list_reduce({lit}, (a, b) -> a * b)"
    ).fetchone()[0]
    con.close()
    assert struct.pack(">d", py) == struct.pack(">d", dk)


def test_embedding_magnitudes_within_quantized_exactness_budget():
    """The exact-integer dot contract (kNN/TF-IDF/PCA) needs every
    64-term product-sum of floor(x·1e6) components below 2⁵³, i.e.
    max |component| ≤ sqrt(2⁵³/64)/1e6 ≈ 11.8. The harness embeddings
    sit near ±0.5 — assert with a wide guard so a future testdata
    regeneration that widens the range fails HERE with a clear
    message instead of silently losing exactness."""
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq

    budget = float(np.sqrt(2.0**53 / 64) / 1e6)  # ≈ 11.86
    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/embeddings.parquet"
        if not os.path.exists(p):
            continue
        t = pq.read_table(p, columns=["embedding"])
        x = np.abs(np.array(t.column("embedding").to_pylist(), dtype=np.float64))
        assert float(x.max()) < budget / 4, (
            f"{sf}: max |component| {x.max():.3f} eats into the "
            f"exact-integer budget ({budget:.2f}); re-derive the "
            "quantization scale in operators/similarity.py"
        )
        checked += 1
    assert checked, "no testdata found to check"


# --- round-8 second-session families -----------------------------------------


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=30).map(
            " ".join
        ),
        min_size=2,
        max_size=5,
    ),
)
@settings(**SETTINGS)
def test_winnowing_coverage_theorem(spark, docs):
    """Any two docs sharing a run of >= k+w-1 tokens share >= 1
    fingerprint (Schleimer'03 coverage) — enforced by PLANTING a
    common 6-token passage into the first two docs."""
    from teleco_etl_pipeline_spark.operators.dedup import (
        winnowing_fingerprints,
        _WINNOW_K,
        _WINNOW_W,
    )

    passage = "zz1 zz2 zz3 zz4 zz5 zz6"  # k+w-1 = 6 tokens, unique marker
    rows = [
        (0, docs[0] + " " + passage),
        (1, passage + " " + docs[1]),
    ] + [(i, t) for i, t in enumerate(docs[2:], start=2)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnowing_fingerprints(df, k=_WINNOW_K, w=_WINNOW_W)
    a = {r.fp for r in fps.filter("doc_id = 0").collect()}
    b = {r.fp for r in fps.filter("doc_id = 1").collect()}
    assert a & b, "planted common run must yield a shared fingerprint"


@given(seed_rows=st.lists(st.integers(0, 10**6), min_size=5, max_size=40, unique=True))
@settings(**SETTINGS)
def test_kcenter_greedy_invariants(spark, seed_rows):
    """The greedy pick at round r is at least as far from the
    selected set as every LATER pick was at ITS round (max-min radii
    are non-increasing), and picks are distinct."""
    from teleco_etl_pipeline_spark.operators.similarity import kcenter_coreset

    rows = [
        (int(i), [((i * 37 + d * 11) % 97) / 97.0 - 0.5 for d in range(4)])
        for i in seed_rows
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    k = min(4, len(rows))
    out = kcenter_coreset(df, k=k).collect()
    assert len({r.vec_id for r in out}) == len(out) == k
    radii = [r.dist_sq for r in out[1:]]
    assert radii == sorted(radii, reverse=True)


@given(
    vals=st.lists(st.integers(1, 10**6), min_size=3, max_size=50),
)
@settings(**SETTINGS)
def test_histogram_double_rank_equals_window_rank(spark, vals):
    """The value-histogram double-rank (2*cum - cnt + 1, the Spearman
    machinery) equals the window spelling 2*rank + ties - 1 on every
    value, duplicates included."""
    from pyspark.sql import Window

    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    win = (
        2 * F.rank().over(Window.orderBy("v"))
        + F.count(F.lit(1)).over(Window.partitionBy("v"))
        - 1
    ).alias("dr_win")
    expect = {r.v: r.dr_win for r in df.select("v", win).collect()}
    vc = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = F.sum("c").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r.v: r.dr
        for r in vc.select("v", (2 * cum - F.col("c") + 1).alias("dr")).collect()
    }
    assert got == expect


# --- PNG decoder round-trip (operators/multimodal.py:_png_decode_fn) ---------
#
# Spec-level property: for ANY 8-bit non-interlaced image and ANY
# per-row filter choice, encode(pixels, filters) must decode back to
# the same dimensions and exact mean — i.e. the five scanline filters
# are information-free re-codings. The encoder lives in the test
# suite (tests/test_ml_streaming_multimodal.py), so the decoder is
# never checked against itself.


@given(
    data=st.data(),
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    nch=st.sampled_from([1, 2, 3, 4]),
)
@settings(max_examples=30, deadline=None)
def test_png_decode_roundtrip_any_filters(data, w, h, nch):
    from teleco_etl_pipeline_spark.operators.multimodal import decode_png
    from tests.test_ml_streaming_multimodal import _encode_png

    pixels = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * nch, max_size=w * nch
                )
            )
        )
        for _ in range(h)
    ]
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    png = _encode_png(pixels, nch, filters=filters)
    exp_mean = round(sum(sum(r) for r in pixels) / (h * w * nch), 4)
    assert decode_png(png) == (w, h, exp_mean)


# --- synchronous LPA vs pure-Python reference (operators/graph.py) ------------


@given(
    edges=st.sets(
        st.tuples(st.integers(1, 9), st.integers(1, 9)).filter(
            lambda t: t[0] < t[1]
        ),
        min_size=1,
        max_size=14,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_lpa_supersteps_match_python_reference(spark, edges):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from teleco_etl_pipeline_spark.operators.graph import _LPA_ITERS

    # pure-Python synchronous LPA, count-DESC / label-ASC tie-break
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lab = {n: n for n in adj}
    for _ in range(_LPA_ITERS):
        new = {}
        for n, nbrs in adj.items():
            votes: dict[int, int] = {}
            for m in nbrs:
                votes[lab[m]] = votes.get(lab[m], 0) + 1
            new[n] = min(
                (l for l in votes),
                key=lambda l: (-votes[l], l),
            )
        lab = new

    e = spark.createDataFrame(sorted(edges), ["u", "v"])
    und = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(_LPA_ITERS):
        votes_df = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy(und["a"].alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes_df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("node", "lab")
        )
    got = {r["node"]: r["lab"] for r in labels.collect()}
    assert got == lab
