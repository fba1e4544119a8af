"""Winnowing fingerprints (operators/dedup.py) and greedy k-center
coreset selection (operators/similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.operators.dedup import (
    winnowing_fingerprints,
    winnowing_pairs,
)
from teleco_etl_pipeline_spark.operators.similarity import kcenter_coreset
from teleco_etl_pipeline_spark.plans.registry import all_queries


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_winnowing_coverage_guarantee(spark):
    # The paper's theorem: any shared token run of length >= k+w-1
    # (here 3+4-1=6) contributes at least one common fingerprint.
    shared = "alpha beta gamma delta epsilon zeta"
    d = _docs(
        spark,
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} completely different tail here now"),
            (3, "nothing in common with anything else at all"),
        ],
    )
    pairs = winnowing_pairs(d, min_shared=1, max_doc_freq=None).collect()
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_winnowing_short_docs_drop(spark):
    # Fewer than k+w-1 = 6 tokens -> no full window -> no fingerprints.
    d = _docs(spark, [(1, "a b c d e"), (2, "a b c d e f")])
    out = winnowing_fingerprints(d).groupBy("doc_id").count().collect()
    assert {r.doc_id for r in out} == {2}


def test_winnowing_identical_docs_share_all_fps(spark):
    text = "the quick brown fox jumps over the lazy dog again"
    d = _docs(spark, [(1, text), (2, text)])
    fps = winnowing_fingerprints(d)
    n1 = fps.filter("doc_id = 1").count()
    pair = winnowing_pairs(d, min_shared=1, max_doc_freq=None).collect()
    assert len(pair) == 1
    assert pair[0].shared_fps == n1


def test_winnowing_density(spark, sf_dir):
    # Expected fingerprint density ~2/(w+1) of k-gram positions; allow
    # a generous band (distinct-ing reduces it further).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_kg = docs.select(
        F.sum(
            F.greatest(
                F.size(F.split(F.trim("text"), r"\s+")) - 2, F.lit(0)
            )
        )
    ).collect()[0][0]
    n_fp = winnowing_fingerprints(docs).count()
    assert 0.05 * n_kg < n_fp < 0.6 * n_kg


def _emb(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kcenter_picks_spread_points(spark):
    # Three tight clusters + k=3 -> one pick per cluster.
    import itertools

    rows = []
    vid = 0
    for cx in (0.0, 0.3, -0.4):
        for d in (0.0, 0.001, 0.002):
            rows.append((vid, [cx + d, cx - d] + [0.0] * 6))
            vid += 1
    df = _emb(spark, rows)
    out = kcenter_coreset(df, k=3).collect()
    assert [r.sel_round for r in out] == [0, 1, 2]
    picked_clusters = {r.vec_id // 3 for r in out}
    assert picked_clusters == {0, 1, 2}
    # selection radii are non-increasing after round 1 (greedy max-min)
    d = [r.dist_sq for r in out]
    assert d[0] == 0
    assert d[1] >= d[2] >= 0


def test_kcenter_seed_is_min_vec_id(spark):
    df = _emb(spark, [(7, [0.1, 0.2]), (3, [0.3, 0.4]), (9, [0.0, 0.0])])
    out = kcenter_coreset(df, k=2).collect()
    assert out[0].sel_round == 0
    assert out[0].vec_id == 3
    assert out[0].dist_sq == 0


def test_kcenter_query_shape(spark, sf_dir):
    out = all_queries()["embedding_kcenter_coreset"].build(spark, sf_dir).collect()
    assert len(out) == 8
    assert [r.sel_round for r in out] == list(range(8))
    assert len({r.vec_id for r in out}) == 8
    radii = [r.dist_sq for r in out[1:]]
    assert radii == sorted(radii, reverse=True)
    assert all(r > 0 for r in radii)


def test_contamination_winnowing_query(spark, sf_dir):
    out = (
        all_queries()["contamination_winnowing"].build(spark, sf_dir).collect()
    )
    # every reported pair crosses the split boundary and meets the
    # shared-fingerprint floor
    from teleco_etl_pipeline_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = hash_bucket("doc_id")
    splits = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id",
            F.when(b < 800000, "train")
            .when(b >= 900000, "test")
            .alias("s"),
        ).collect()
    }
    assert out, "synthetic corpus contains cross-split near-dups"
    for r in out:
        assert splits[r.train_doc_id] == "train"
        assert splits[r.test_doc_id] == "test"
        assert r.shared_fps >= 2


def test_contamination_winnowing_catches_embedded_passage(spark):
    # A test doc whose passage is EMBEDDED mid-document in a train doc
    # must be flagged; head-hash fingerprints cannot see it.
    from pyspark.sql import functions as F
    from teleco_etl_pipeline_spark.operators.sampling import hash_bucket

    # find ids landing in train / test buckets
    ids = spark.range(0, 2000).select(
        F.col("id"), hash_bucket(F.col("id")).alias("b")
    )
    train_id = ids.filter("b < 800000").first().id
    test_id = ids.filter("b >= 900000").first().id
    passage = "quick zephyrs blow vexing daft jim forward now"
    rows = [
        (train_id, f"lots of leading filler words here {passage} and trailing tail"),
        (test_id, passage),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    from teleco_etl_pipeline_spark.operators.dedup import (
        winnowing_fingerprints,
        _WINNOW_K,
        _WINNOW_W,
    )

    fps = winnowing_fingerprints(docs, k=_WINNOW_K, w=_WINNOW_W)
    shared = (
        fps.filter(F.col("doc_id") == train_id)
        .select("fp")
        .intersect(fps.filter(F.col("doc_id") == test_id).select("fp"))
        .count()
    )
    # coverage theorem: the 8-token shared run guarantees >= 1 common
    # fingerprint; this passage yields >= 2
    assert shared >= 2


def test_contamination_guard_counts_split_docs_only(spark):
    # Regression (round-9 ADVICE): the stop-fingerprint guard must
    # count doc-frequency over SPLIT-ASSIGNED docs only, mirroring
    # the oracle's WHERE split IS NOT NULL placement. Here a passage
    # appears in exactly _WINNOW_MAXDOC assigned docs (19 train + 1
    # test -> kept) plus 6 UNASSIGNED docs; counting the unassigned
    # population would push the frequency to 26 > 20 and silently
    # drop every fingerprint, missing the contamination. Bucket ids
    # precomputed from md5(str(id))[:8] % 1e6 (hash_bucket's form):
    # train < 800000, test >= 900000, unassigned in between.
    train_ids = [0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 17, 18, 19, 21]
    test_id = 4
    unassigned_ids = [14, 28, 37, 40, 41, 42]
    passage = (
        "quick zephyrs blow vexing daft jim forward now "
        "and backwards again"
    )
    rows = [(i, passage) for i in train_ids + [test_id] + unassigned_ids]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    docs.write.mode("overwrite").parquet("/tmp/__contam/documents.parquet")
    out = (
        all_queries()["contamination_winnowing"]
        .build(spark, "/tmp/__contam")
        .collect()
    )
    got = {(r.train_doc_id, r.test_doc_id) for r in out}
    assert (train_ids[0], test_id) in got
    assert len(got) == len(train_ids)
    assert all(r.shared_fps >= 2 for r in out)


def test_minhash_recall_eval_consistency(spark, sf_dir):
    row = (
        all_queries()["minhash_recall_eval"].build(spark, sf_dir).collect()[0]
    )
    assert row.n_true_pos <= min(row.n_exact, row.n_sketch)
    assert 0.0 <= row.precision_est <= 1.0
    assert 0.0 <= row.recall_est <= 1.0
    # on this corpus the banding catches most real >= 0.25 pairs
    assert row.n_exact > 0
    assert row.recall_est > 0.5


def test_novelty_scores_bounds_and_duplicate_detection(spark):
    # doc 1 and 2 share everything; doc 3 is unique
    d = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "omega psi chi phi upsilon tau"),
        ],
        ["doc_id", "text"],
    )
    d.write.mode("overwrite").parquet("/tmp/__nov/documents.parquet")
    rows = {
        r.doc_id: r
        for r in all_queries()["doc_novelty_scores"]
        .build(spark, "/tmp/__nov")
        .collect()
    }
    assert rows[1].pct_shared == 1.0
    assert rows[2].pct_shared == 1.0
    assert rows[3].pct_shared == 0.0
    assert rows[3].n_shingles == 4


def test_priority_revenue_trend_recovers_injected_slope(spark):
    import datetime

    rows = []
    base = datetime.datetime(2020, 1, 1)
    for day in range(60):
        # revenue grows exactly $10/day
        rows.append(
            (
                "1-URGENT",
                base + datetime.timedelta(days=day),
                100.0 + 10.0 * day,
            )
        )
    df = spark.createDataFrame(
        rows, ["o_orderpriority", "o_orderdate", "o_totalprice"]
    )
    df.write.mode("overwrite").parquet("/tmp/__trend/orders.parquet")
    out = (
        all_queries()["priority_revenue_trend"]
        .build(spark, "/tmp/__trend")
        .collect()
    )
    assert len(out) == 1
    assert abs(out[0].slope_dollars_per_day - 10.0) < 1e-6
    assert abs(out[0].r2 - 1.0) < 1e-9
    assert out[0].n_days == 60


def test_recommended_planes_sizing():
    from teleco_etl_pipeline_spark.operators.similarity import (
        recommended_planes,
    )

    # buckets hold ~target rows: 2^planes >= n / target
    assert recommended_planes(100) == 1
    assert recommended_planes(2_000, 256) == 3
    assert recommended_planes(20_000, 256) == 7
    assert recommended_planes(10**9, 256) == 22
    for n in (10**3, 10**6, 10**9):
        p = recommended_planes(n)
        assert n / (2**p) <= 256 < n / (2 ** (p - 1)) or n <= 256


def test_sized_planes_exact_integer_rule():
    """sized_planes is the exact-integer twin of recommended_planes
    and of the DuckDB LENGTH(BIN(...)) expression in the sized
    oracles — same value for every n, no float log anywhere."""
    import math

    import duckdb

    from teleco_etl_pipeline_spark.operators.similarity import (
        _LSH_TARGET,
        _KNN_TARGET,
        sized_planes,
    )

    # The committed SF anchor points (see the registered-query docs):
    assert sized_planes(500, _LSH_TARGET) == 6  # == the old fixed-6
    assert sized_planes(2_000, _LSH_TARGET) == 8
    assert sized_planes(20_000, _LSH_TARGET) == 12  # sf1 measured-flat
    assert sized_planes(500, _KNN_TARGET) == 4  # == the old fixed-4
    assert sized_planes(20_000, _KNN_TARGET) == 10
    con = duckdb.connect()
    for target in (_LSH_TARGET, _KNN_TARGET, 256):
        for n in (1, 7, 8, 9, 63, 64, 65, 500, 2_000, 20_000, 10**6):
            py = sized_planes(n, target)
            # ceil(log2(ceil(n/target))) in exact-math form
            assert py == max(1, math.ceil(math.log2(-(-n // target)))), (
                n,
                target,
            )
            sql = con.execute(
                f"SELECT LENGTH(BIN(({n} + {target - 1}) // {target} - 1))"
            ).fetchone()[0]
            assert sql == py, (n, target, sql, py)
    # The REAL oracle aggregate (_sql_sized_p) over n-row relations,
    # including the n=0 empty-table edge (r10 ADVICE: BIN(-1) is 64
    # one-bits; the GREATEST(0, ...) clamp must make SQL return the
    # Python guard's 1) and the cap region.
    from teleco_etl_pipeline_spark.operators.similarity import (
        _SIZED_PMAX,
        _sql_sized_p,
    )

    for target in (_LSH_TARGET, _KNN_TARGET):
        for n in (0, 1, 8, 500, 20_000):
            sql = con.execute(
                f"SELECT {_sql_sized_p(target)} FROM range({n})"
            ).fetchone()[0]
            assert sql == min(_SIZED_PMAX, sized_planes(n, target)), (
                n,
                target,
                sql,
            )
    # cap engages identically both sides at 20M rows (rule wants >20)
    sql = con.execute(
        f"SELECT {_sql_sized_p(8)} FROM range(20_000_000)"
    ).fetchone()[0]
    assert sql == _SIZED_PMAX == min(
        _SIZED_PMAX, sized_planes(20_000_000, 8)
    )


def test_hyperplanes_prefix_stable():
    """The masked-bit sized oracles bake 16-plane literal matrices
    and gate bits on the runtime plane count; the Spark side
    generates only p planes. Both produce the same bucket ONLY if
    numpy plane generation is prefix-stable — pin that contract."""
    import numpy as np

    from teleco_etl_pipeline_spark.operators.similarity import (
        _SIZED_PMAX,
        hyperplanes,
    )

    full = hyperplanes(64, _SIZED_PMAX, 42)
    for p in (1, 4, 6, 8, 12, 16, 17, _SIZED_PMAX):
        assert np.array_equal(hyperplanes(64, p, 42), full[:p])
    # floor-quantization (the kNN path) preserves the prefix
    assert np.array_equal(
        np.floor(hyperplanes(64, 4, 42) * 1e6), np.floor(full[:4] * 1e6)
    )


def test_sq8_codes_bounded_and_recall_vs_exact(spark, sf_dir):
    """SQ8 contract: signed byte codes land in [-127, 127]; codes are
    integer-valued doubles (exact dot/den arithmetic); and the
    8-bit-coarse candidate scan + exact rerank recovers most of the
    true exact top-10 (recall >= 0.7 on the 64-dim synthetic
    corpus — the asymmetric [min,max] byte mapping this replaced
    measured recall 0.0 here: its b·Σx offset term swamps the
    similarity signal on zero-mean embeddings)."""
    from pyspark.sql import functions as F

    from teleco_etl_pipeline_spark.plans.registry import all_queries
    from teleco_etl_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    de = F.col("embedding").cast("array<double>")
    mabs = float(
        emb.agg(
            F.max(F.greatest(F.array_max(de), -F.array_min(de))).alias("m")
        ).first()["m"]
    )
    code = F.transform(
        de,
        lambda x: F.least(
            F.lit(127.0),
            F.greatest(
                F.lit(-127.0),
                F.floor(x * F.lit(127.0 / mabs)).cast("double"),
            ),
        ),
    )
    bounds = emb.select(
        F.array_min(code).alias("lo"), F.array_max(code).alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).first()
    assert -127.0 <= bounds["lo"] and bounds["hi"] <= 127.0
    # integer-valued: floor(code) == code everywhere
    frac = emb.select(
        F.exists(code, lambda c: c != F.floor(c).cast("double")).alias("f")
    ).filter(F.col("f")).count()
    assert frac == 0

    qs = all_queries()
    sq8 = [r.vec_id for r in qs["embedding_sq8_topk"].build(spark, sf_dir).collect()]
    exact = [r.vec_id for r in qs["embedding_topk"].build(spark, sf_dir).collect()]
    assert len(sq8) == len(exact) == 10
    recall = len(set(sq8) & set(exact)) / 10
    assert recall >= 0.7, (recall, sq8, exact)


def test_matryoshka_recall_monotone_and_bounded(spark, sf_dir):
    """Per-truncation recall vs the full-dim ranking: 50 ranked pairs
    per truncation (10 per anchor), recall in [0,1] and nondecreasing
    in dimension on the committed testdata."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    rows = (
        all_queries()["embedding_matryoshka_recall"]
        .build(spark, sf_dir)
        .collect()
    )
    assert [r.dim for r in rows] == [8, 16, 32]
    assert all(r.n_pairs == 50 for r in rows)
    recalls = [r.recall_at_k for r in rows]
    assert all(0.0 <= r <= 1.0 for r in recalls)
    assert recalls == sorted(recalls)


def test_matryoshka_perfect_recall_when_tail_dims_are_zero(spark):
    """Vectors whose information lives entirely in the first 8 dims
    (zero tail) must give recall 1.0 at EVERY truncation — pins the
    slice arithmetic (a 1-based off-by-one would break this)."""
    import numpy as np

    from teleco_etl_pipeline_spark.operators.similarity import batch_topk
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    vecs = []
    for i in range(30):
        v = np.zeros(64, dtype=np.float64)
        v[:8] = rng.normal(size=8)
        v /= np.linalg.norm(v)
        vecs.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    full = {
        (r.query_id, r.vec_id)
        for r in batch_topk(emb, qs, k=5).collect()
    }
    sl = emb.select("vec_id", F.slice("embedding", 1, 8).alias("embedding"))
    qs8 = sl.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    trunc = {
        (r.query_id, r.vec_id)
        for r in batch_topk(sl, qs8, k=5).collect()
    }
    assert trunc == full


def test_jl_recall_matches_numpy_bruteforce(spark, sf_dir):
    """Third-way check: the JL projection, quantization, ranking and
    recall recomputed with numpy over the raw parquet (no shared SQL,
    no shared Spark plan)."""
    import hashlib

    import duckdb
    import numpy as np

    from teleco_etl_pipeline_spark.plans.registry import all_queries

    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows], dtype=np.float64)

    def topk(mat, k=10, nq=5):
        den = (mat * mat).sum(1)
        out = {}
        for qi in range(nq):
            qrow = mat[ids == qi][0]
            qden = den[ids == qi][0]
            sims = []
            for j in range(len(ids)):
                if ids[j] == qi:
                    continue
                dp = qden * den[j]
                s = (qrow @ mat[j]) / np.sqrt(dp) if dp > 0 else -2.0
                sims.append((-s, ids[j]))
            sims.sort()
            out[qi] = [v for _, v in sims[:k]]
        return out

    full = topk(np.floor(x * 1e6))
    q = np.floor(x * 1e3)
    expect = []
    for d in (8, 16, 32):
        s = np.array(
            [
                [
                    1.0
                    if int(
                        hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[0],
                        16,
                    )
                    % 2
                    == 0
                    else -1.0
                    for i in range(64)
                ]
                for j in range(d)
            ]
        )
        t = topk(q @ s.T)
        n_over = sum(len(set(t[qi]) & set(full[qi])) for qi in range(5))
        expect.append((d, 50, n_over))
    got = [
        (r.dim, r.n_pairs, r.n_overlap)
        for r in all_queries()["embedding_jl_recall"]
        .build(spark, sf_dir)
        .collect()
    ]
    assert got == expect


def test_mmr_rerank_matches_numpy_greedy(spark, sf_dir):
    """Third-way check: the MMR greedy selection recomputed with
    numpy floats over the raw parquet — pool membership, pick order
    and scores must agree."""
    import duckdb
    import numpy as np

    from teleco_etl_pipeline_spark.plans.registry import all_queries

    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    q = np.floor(
        np.array([r[1] for r in rows], dtype=np.float64) * 1e6
    )
    den = (q * q).sum(1)
    qi = int(np.where(ids == 0)[0][0])

    def sim(i, j):
        dp = den[i] * den[j]
        return (q[i] @ q[j]) / np.sqrt(dp) if dp > 0 else -2.0

    simq = {
        j: sim(qi, j) for j in range(len(ids)) if ids[j] != 0
    }
    pool = sorted(simq, key=lambda j: (-simq[j], ids[j]))[:20]
    lam, mu = 0.7, 0.3
    sel = [min(pool, key=lambda j: (-simq[j], ids[j]))]
    expect = [(1, ids[sel[0]], lam * simq[sel[0]])]
    for k in range(2, 6):
        best = None
        for c in pool:
            if c in sel:
                continue
            score = lam * simq[c] - mu * max(sim(c, s) for s in sel)
            key = (-score, ids[c])
            if best is None or key < best[0]:
                best = (key, c, score)
        sel.append(best[1])
        expect.append((k, ids[best[1]], best[2]))
    import pytest

    got = [
        (r.rank, r.vec_id, r.mmr_score)
        for r in all_queries()["embedding_mmr_rerank"]
        .build(spark, sf_dir)
        .collect()
    ]
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expect]
    for g, e in zip(got, expect):
        assert g[2] == pytest.approx(e[2], abs=2e-6)


def test_cluster_quality_matches_numpy(spark, sf_dir):
    """Third-way check: fit replica + silhouette/scatter/DB recomputed
    with plain numpy floats (no quantized fold, no shared SQL)."""
    import duckdb
    import numpy as np
    import pytest

    from teleco_etl_pipeline_spark.operators.similarity import (
        _CQ_FIT_SAMPLE,
        _CQ_K,
        _CQ_MAX_ITER,
        _CQ_SEED,
        _ivf_fit_replica,
        _cq_qcents,
    )
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    _ids, vecs, cents = _ivf_fit_replica(
        sf_dir, _CQ_K, _CQ_SEED, _CQ_FIT_SAMPLE, _CQ_MAX_ITER
    )
    qc = _cq_qcents(cents)
    x = np.floor(vecs * 1e6)
    d = ((x[:, None, :] - qc[None, :, :]) ** 2).sum(axis=-1)
    lab = d.argmin(axis=1)
    srt = np.sort(d, axis=1)
    sa, sb = np.sqrt(srt[:, 0]), np.sqrt(srt[:, 1])
    sil = np.where(srt[:, 1] > 0, (sb - sa) / np.where(sb > 0, sb, 1), 0.0)
    rows = (
        all_queries()["embedding_cluster_quality"]
        .build(spark, sf_dir)
        .collect()
    )
    assert [r.cluster_id for r in rows] == sorted(set(lab.tolist()))
    scat = {}
    for r in rows:
        m = lab == r.cluster_id
        assert r.n_vecs == int(m.sum())
        assert r.mean_dist == pytest.approx(
            sa[m].mean() / 1e6, abs=2e-3
        )
        assert r.mean_silhouette == pytest.approx(sil[m].mean(), abs=2e-4)
        scat[r.cluster_id] = sa[m].mean()
    for r in rows:
        db = max(
            (scat[r.cluster_id] + scat[j])
            / np.sqrt(((qc[r.cluster_id] - qc[j]) ** 2).sum())
            for j in scat
            if j != r.cluster_id
        )
        # scatter floors at milli-q grain per point; the DB ratio
        # sums two scatters, so its bias bound doubles
        assert r.db_component == pytest.approx(db, abs=8e-3)


def test_margin_pairs_matches_numpy(spark, sf_dir):
    """Ratio-margin rescoring recomputed with plain numpy floats."""
    import duckdb
    import numpy as np
    import pytest

    from teleco_etl_pipeline_spark.plans.registry import all_queries

    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    q = np.floor(np.array([r[1] for r in rows], dtype=np.float64) * 1e6)
    den = (q * q).sum(1)

    def topk(qi, k=8):
        i = int(np.where(ids == qi)[0][0])
        sims = []
        for j in range(len(ids)):
            if ids[j] == qi:
                continue
            dp = den[i] * den[j]
            s = (q[i] @ q[j]) / np.sqrt(dp) if dp > 0 else -2.0
            sims.append((-s, ids[j]))
        sims.sort()
        return [(v, -s) for s, v in sims[:k]]

    t1 = {a: topk(a) for a in range(5)}
    cands = sorted({v for lst in t1.values() for v, _ in lst})
    cmean = {c: sum(s for _, s in topk(c)) / 8 for c in cands}
    qmean = {a: sum(s for _, s in lst) / 8 for a, lst in t1.items()}
    expect = []
    for a in range(5):
        scored = [
            (v, s / ((qmean[a] + cmean[v]) / 2)) for v, s in t1[a]
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        expect += [(a, v, m) for v, m in scored]
    got = [
        (r.query_id, r.vec_id, r.margin)
        for r in all_queries()["embedding_margin_pairs"]
        .build(spark, sf_dir)
        .collect()
    ]
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expect]
    for g, e in zip(got, expect):
        assert g[2] == pytest.approx(e[2], abs=2e-5)
