"""Round-13 operators vs independent pure-Python references.

Same contract as test_stats_r12.py: recompute each statistic a THIRD
way (brute-force Python over the sf parquet, textbook formulas — no
shared SQL, no shared Spark plan) so a mirrored mistake in both the
plan and its oracle cannot hide."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from teleco_etl_pipeline_spark.plans.registry import all_queries


def _run(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir).collect()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _avg_ranks(values):
    """value -> average rank (1-based) over the pooled sorted list."""
    counts = Counter(values)
    ranks = {}
    cum = 0
    for v in sorted(counts):
        t = counts[v]
        ranks[v] = cum + (t + 1) / 2
        cum += t
    return ranks, counts


def test_kruskal_wallis_matches_textbook(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    pooled = [c for _, c in rows]
    ranks, counts = _avg_ranks(pooled)
    n = len(pooled)
    groups: dict[str, list[int]] = {}
    for p, c in rows:
        groups.setdefault(p, []).append(c)
    h = (12.0 / (n * (n + 1))) * sum(
        (sum(ranks[c] for c in xs)) ** 2 / len(xs) for xs in groups.values()
    ) - 3 * (n + 1)
    corr = 1.0 - sum(t**3 - t for t in counts.values()) / (n**3 - n)
    h_corr = h / corr
    (r,) = _run(spark, sf_dir, "orders_kruskal_wallis")
    assert r["k_groups"] == len(groups)
    assert r["n_rows"] == n
    # engine value floor-quantizes 3*R2g^2/ng per group (5 groups):
    # statistic may sit up to ~5/(n(n+1)) below the float value
    assert r["h_stat"] == pytest.approx(h_corr, abs=2e-4)


def test_mann_kendall_matches_bruteforce(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT o_orderdate,"
        " SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))"
        " FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    xs = [c for _, c in rows]
    n = len(xs)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (xs[j] > xs[i]) - (xs[j] < xs[i])
    ties = Counter(xs)
    var = (
        n * (n - 1) * (2 * n + 5)
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    ) / 18.0
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    z = (s - cc) / math.sqrt(var) if var > 0 else 0.0
    (r,) = _run(spark, sf_dir, "daily_revenue_mann_kendall")
    assert r["n_days"] == n
    assert r["s_stat"] == s
    assert r["z_stat"] == pytest.approx(z, abs=2e-4)


def test_cvm_matches_bruteforce_ecdf(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
        " WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
    ).fetchall()
    g1 = sorted(c for p, c in rows if p == "1-URGENT")
    g2 = sorted(c for p, c in rows if p == "5-LOW")
    n1, n2 = len(g1), len(g2)
    pooled = sorted(g1 + g2)
    import bisect

    t = 0.0
    for x in pooled:
        f1 = bisect.bisect_right(g1, x) / n1
        f2 = bisect.bisect_right(g2, x) / n2
        t += (f1 - f2) ** 2
    t *= n1 * n2 / (n1 + n2) ** 2
    (r,) = _run(spark, sf_dir, "cvm_priority_totalprice")
    assert r["n_urgent"] == n1 and r["n_low"] == n2
    # per-distinct-value 1e-12 floor quantization: bias under
    # |values|*1e-12, far inside the tolerance
    assert r["t_stat"] == pytest.approx(t, abs=2e-5)


def test_bucketed_range_search_is_verified_subset(spark, sf_dir):
    """Every bucketed hit must clear tau AND appear in the exact
    twin's result (the LSH stage only prunes candidates — the verify
    filter is identical, so no false positives are possible)."""
    exact = {
        (r["anchor_id"], r["vec_id"]): r["cosine_sim"]
        for r in _run(spark, sf_dir, "embedding_query_range_search")
    }
    got = _run(spark, sf_dir, "embedding_query_range_search_bucketed")
    for r in got:
        key = (r["anchor_id"], r["vec_id"])
        assert key in exact
        assert r["cosine_sim"] == exact[key]
        assert r["cosine_sim"] >= 0.40


def test_jonckheere_terpstra_matches_bisect_bruteforce(spark, sf_dir):
    """J via an independent code path: per group-pair U_ij counted
    with bisect over sorted per-group lists (no value-histogram, no
    SQL); z via the textbook Hollander-Wolfe tie-corrected normal
    approximation."""
    import bisect

    rows = _con(sf_dir).execute(
        "SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS INT),"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    groups: dict[int, list[int]] = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    for xs in groups.values():
        xs.sort()
    ks = sorted(groups)
    j = 0.0
    for a in range(len(ks)):
        for b in range(a + 1, len(ks)):
            gi, gj = groups[ks[a]], groups[ks[b]]
            for y in gj:
                lo = bisect.bisect_left(gi, y)
                hi = bisect.bisect_right(gi, y)
                j += lo + (hi - lo) / 2.0
    n = len(rows)
    ns = [len(groups[g]) for g in ks]
    ties = Counter(c for _, c in rows)
    e_j = (n * n - sum(x * x for x in ns)) / 4.0
    a_term = (
        n * (n - 1) * (2 * n + 5)
        - sum(x * (x - 1) * (2 * x + 5) for x in ns)
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    )
    var = (
        a_term / 72.0
        + (
            sum(x * (x - 1) * (x - 2) for x in ns)
            * sum(t * (t - 1) * (t - 2) for t in ties.values())
        )
        / (36.0 * n * (n - 1) * (n - 2))
        + (
            sum(x * (x - 1) for x in ns)
            * sum(t * (t - 1) for t in ties.values())
        )
        / (8.0 * n * (n - 1))
    )
    z = (j - e_j) / math.sqrt(var)
    (r,) = _run(spark, sf_dir, "orders_jonckheere_terpstra")
    assert r["k_groups"] == len(ks)
    assert r["n_rows"] == n
    assert r["j_stat"] == pytest.approx(j, abs=0.51)
    assert r["z_stat"] == pytest.approx(z, abs=2e-4)


def test_welch_ttest_matches_textbook(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
        " WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
    ).fetchall()
    g1 = [c for p, c in rows if p == "1-URGENT"]
    g2 = [c for p, c in rows if p == "5-LOW"]
    n1, n2 = len(g1), len(g2)
    m1, m2 = sum(g1) / n1, sum(g2) / n2
    v1 = sum((x - m1) ** 2 for x in g1) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in g2) / (n2 - 1)
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(se1 + se2)
    dof = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
    (r,) = _run(spark, sf_dir, "orders_welch_ttest")
    assert r["n_urgent"] == n1 and r["n_low"] == n2
    assert r["mean_diff_cents"] == pytest.approx(m1 - m2, abs=0.02)
    assert r["t_stat"] == pytest.approx(t, abs=2e-4)
    assert r["welch_dof"] == pytest.approx(dof, rel=1e-4)


def test_rich_club_matches_bruteforce(spark, sf_dir):
    """phi(k) recomputed from a NetworkX-free adjacency build over
    the same volume-scaled edge cut."""
    from collections import defaultdict

    con = _con(sf_dir)
    n_orders = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    min_co = max(2, -(-n_orders // 75_000))
    pairs = con.execute(
        """
        WITH ds AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey, COUNT(*) AS c
        FROM ds a JOIN ds b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    edges = [(u, v) for u, v, c in pairs if c >= min_co]
    deg: dict[int, int] = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    got = {r["k"]: r for r in _run(spark, sf_dir, "part_rich_club")}
    assert sorted(got) == [1, 2, 3, 4, 5]
    for k in range(1, 6):
        nodes = {n for n, d in deg.items() if d > k}
        ek = sum(1 for u, v in edges if u in nodes and v in nodes)
        assert got[k]["n_nodes"] == len(nodes)
        assert got[k]["n_edges"] == ek
        if len(nodes) >= 2:
            phi = 2.0 * ek / (len(nodes) * (len(nodes) - 1))
            assert got[k]["phi"] == pytest.approx(phi, abs=2e-6)
        else:
            assert got[k]["phi"] == 0.0


def test_anova_f_matches_textbook(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS INT),"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    groups: dict[int, list[int]] = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    n = len(rows)
    k = len(groups)
    grand = sum(c for _, c in rows) / n
    ssb = sum(len(xs) * (sum(xs) / len(xs) - grand) ** 2 for xs in groups.values())
    ssw = sum(
        sum((x - sum(xs) / len(xs)) ** 2 for x in xs) for xs in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    eta = ssb / (ssb + ssw)
    (r,) = _run(spark, sf_dir, "orders_anova_f")
    assert r["k_groups"] == k
    assert r["n_rows"] == n
    assert r["f_stat"] == pytest.approx(f, abs=2e-4)
    assert r["eta_sq"] == pytest.approx(eta, abs=2e-6)


def test_anderson_darling_matches_scholz_stephens(spark, sf_dir):
    """A^2_2N (Scholz & Stephens 1987 eq. 5, discrete/ties 'version
    1') recomputed per-GROUP (no k=2 gap folding — the engine's
    single-counter identity is exactly what this cross-checks)."""
    rows = _con(sf_dir).execute(
        "SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
        " WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
    ).fetchall()
    g1 = Counter(c for p, c in rows if p == "1-URGENT")
    g2 = Counter(c for p, c in rows if p == "5-LOW")
    n1, n2 = sum(g1.values()), sum(g2.values())
    nn = n1 + n2
    m1 = m2 = b = 0
    a2 = 0.0
    for v in sorted(set(g1) | set(g2)):
        lj = g1.get(v, 0) + g2.get(v, 0)
        m1 += g1.get(v, 0)
        m2 += g2.get(v, 0)
        b += lj
        if b < nn:
            a2 += (
                (lj / nn)
                * (
                    (nn * m1 - n1 * b) ** 2 / n1
                    + (nn * m2 - n2 * b) ** 2 / n2
                )
                / (b * (nn - b))
            )
    (r,) = _run(spark, sf_dir, "ad_priority_totalprice")
    assert r["n_urgent"] == n1 and r["n_low"] == n2
    # per-distinct-value 1e-6 floor quantization: total bias under
    # |values| * 1e-6 * N/(n1*n2) ~ 4e-6 * |values|/N
    assert r["a2_stat"] == pytest.approx(a2, abs=2e-4)


def _daily_series(sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT o_orderdate,"
        " SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))"
        " FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    return [c for _, c in rows]


def test_durbin_watson_matches_ols_bruteforce(spark, sf_dir):
    ys = _daily_series(sf_dir)
    n = len(ys)
    idx = list(range(1, n + 1))
    si, sy = sum(idx), sum(ys)
    siy = sum(i * y for i, y in zip(idx, ys))
    sii = sum(i * i for i in idx)
    b = (n * siy - si * sy) / (n * sii - si * si)
    a = (sy - b * si) / n
    es = [y - a - b * i for i, y in zip(idx, ys)]
    dw = sum((es[t] - es[t - 1]) ** 2 for t in range(1, n)) / sum(
        e * e for e in es
    )
    (r,) = _run(spark, sf_dir, "daily_revenue_durbin_watson")
    assert r["n_days"] == n
    assert r["slope_cents_per_day"] == pytest.approx(b, abs=1e-5)
    # micro-cent residual quantization: |e| ~ 1e6+ cents, bias
    # vanishes at the 4-dp display grain
    assert r["dw_stat"] == pytest.approx(dw, abs=2e-4)


def test_ljung_box_matches_textbook_acf(spark, sf_dir):
    ys = _daily_series(sf_dir)
    n = len(ys)
    mean = sum(ys) / n
    den = sum((y - mean) ** 2 for y in ys)
    q = 0.0
    for k in range(1, 8):
        rk = (
            sum((ys[t] - mean) * (ys[t - k] - mean) for t in range(k, n))
            / den
        )
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    (r,) = _run(spark, sf_dir, "daily_revenue_ljung_box")
    assert r["n_days"] == n
    assert r["h_lags"] == 7
    assert r["q_stat"] == pytest.approx(q, abs=2e-4)


def test_perplexity_buckets_matches_bruteforce_lm(spark, sf_dir):
    """Unigram-LM scores + exact integer tercile recomputed from the
    raw documents in Python (same micro-bit floor quantization; the
    only cross-engine freedom is last-ulp libm log2, absorbed by the
    mean tolerance)."""
    import math
    import re

    docs = _con(sf_dir).execute(
        "SELECT doc_id, lang, text FROM documents"
    ).fetchall()
    tf: dict[str, Counter] = {}
    vocab: Counter = Counter()
    lang_of = {}
    for doc_id, lang, text in docs:
        toks = re.split(r"\s+", text.strip())
        tf[doc_id] = Counter(toks)
        vocab.update(toks)
        lang_of[doc_id] = lang
    n_total = sum(vocab.values())
    bits_q = {
        t: math.floor(-math.log2(c / n_total) * 1e6) for t, c in vocab.items()
    }
    mb = {
        d: math.floor(
            sum(c * bits_q[t] for t, c in cnt.items())
            / sum(cnt.values())
        )
        for d, cnt in tf.items()
    }
    by_lang: dict[str, list] = {}
    for d, s in mb.items():
        by_lang.setdefault(lang_of[d], []).append((s, d))
    expect = {}
    for lang, xs in by_lang.items():
        xs.sort()
        nl = len(xs)
        qn, rem = divmod(nl, 3)
        sizes = [qn + (1 if i < rem else 0) for i in range(3)]
        pos = 0
        for bname, sz in zip(("head", "middle", "tail"), sizes):
            chunk = xs[pos : pos + sz]
            pos += sz
            if sz:
                expect[(lang, bname)] = (
                    sz,
                    sum(s for s, _ in chunk) / sz / 1e6,
                )
    got = _run(spark, sf_dir, "doc_perplexity_buckets")
    assert len(got) == len(expect)
    for r in got:
        sz, mean_bits = expect[(r["lang"], r["bucket"])]
        assert r["n_docs"] == sz
        assert r["mean_bits"] == pytest.approx(mean_bits, abs=2e-3)


def test_ktruss_matches_adjacency_bruteforce(spark, sf_dir):
    """3 rounds of k=4 truss peeling recomputed with set-intersection
    triangle support over the same volume-scaled part edge cut."""
    con = _con(sf_dir)
    n_orders = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    min_co = max(2, -(-n_orders // 75_000))
    pairs = con.execute(
        """
        WITH ds AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey, COUNT(*) AS c
        FROM ds a JOIN ds b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    edges = {(u, v) for u, v, c in pairs if c >= min_co}
    expect = []
    for i in range(1, 4):
        adj: dict[int, set] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        edges = {
            (u, v) for u, v in edges if len(adj[u] & adj[v]) >= 2
        }
        nodes = {u for u, _ in edges} | {v for _, v in edges}
        expect.append((i, len(nodes), len(edges)))
    got = [
        (r["iter"], r["n_nodes"], r["n_edges"])
        for r in _run(spark, sf_dir, "part_ktruss_peel")
    ]
    assert got == expect


def test_jarque_bera_matches_textbook(spark, sf_dir):
    vals = [
        v
        for (v,) in _con(sf_dir)
        .execute("SELECT CAST(ROUND(o_totalprice) AS BIGINT) FROM orders")
        .fetchall()
    ]
    n = len(vals)
    m1 = sum(vals) / n
    mu2 = sum((v - m1) ** 2 for v in vals) / n
    mu3 = sum((v - m1) ** 3 for v in vals) / n
    mu4 = sum((v - m1) ** 4 for v in vals) / n
    s = mu3 / mu2**1.5
    ek = mu4 / mu2**2 - 3.0
    jb = n / 6.0 * (s * s + ek * ek / 4.0)
    (r,) = _run(spark, sf_dir, "orders_jarque_bera")
    assert r["n_rows"] == n
    assert r["skewness"] == pytest.approx(s, abs=2e-3)
    assert r["excess_kurtosis"] == pytest.approx(ek, abs=2e-3)
    assert r["jb_stat"] == pytest.approx(jb, rel=1e-3)


def test_bartlett_matches_textbook(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT CAST(SUBSTR(o_orderpriority,1,1) AS INT),"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    groups: dict[int, list[int]] = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    assert set(groups) == {1, 2, 3, 4, 5}
    n = len(rows)
    k = 5
    var = {}
    for g, xs in groups.items():
        m = sum(xs) / len(xs)
        var[g] = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
    sp2 = sum((len(groups[g]) - 1) * var[g] for g in groups) / (n - k)
    t_num = (n - k) * math.log(sp2) - sum(
        (len(groups[g]) - 1) * math.log(var[g]) for g in groups
    )
    c = 1.0 + (
        sum(1.0 / (len(groups[g]) - 1) for g in groups) - 1.0 / (n - k)
    ) / (3.0 * (k - 1))
    (r,) = _run(spark, sf_dir, "priority_bartlett_test")
    assert r["n_rows"] == n and r["k_groups"] == 5
    assert r["bartlett_t"] == pytest.approx(t_num / c, rel=1e-4, abs=1e-3)


def test_pettitt_matches_bruteforce(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT CAST(o_orderdate AS DATE) AS day,"
        " SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) FROM orders"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [d for d, _ in rows]
    ys = [y for _, y in rows]
    n = len(ys)
    ranks, _ = _avg_ranks(ys)
    rseq = [ranks[y] for y in ys]
    best_k, best_day = -1, None
    cum = 0.0
    for t in range(1, n):  # t = 1 .. n-1
        cum += rseq[t - 1]
        ut = 2 * cum - t * (n + 1)
        if abs(ut) > best_k:
            best_k, best_day = abs(ut), days[t - 1]
    p = 2.0 * math.exp(-6.0 * best_k * best_k / (n**3 + n**2))
    (r,) = _run(spark, sf_dir, "daily_revenue_pettitt")
    assert r["n_days"] == n
    assert r["k_stat"] == int(round(best_k))
    assert r["change_day"] == best_day.strftime("%Y-%m-%d")
    assert r["p_approx"] == pytest.approx(p, abs=2e-6)


def test_cochran_armitage_matches_textbook(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT CAST(SUBSTR(o_orderpriority,1,1) AS INT),"
        " CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END FROM orders"
    ).fetchall()
    n = len(rows)
    r_tot = sum(f for _, f in rows)
    t_stat = sum(g * (f - r_tot / n) for g, f in rows)
    sbar = sum(g for g, _ in rows) / n
    var = (
        (r_tot / n)
        * (1 - r_tot / n)
        * sum((g - sbar) ** 2 for g, _ in rows)
    )
    z = t_stat / math.sqrt(var)
    (r,) = _run(spark, sf_dir, "priority_cochran_armitage")
    assert r["n_rows"] == n and r["n_success"] == r_tot
    assert r["z_trend"] == pytest.approx(z, abs=2e-3)


def test_grubbs_matches_bruteforce(spark, sf_dir):
    vals = [
        v
        for (v,) in _con(sf_dir)
        .execute("SELECT CAST(ROUND(c_acctbal*100) AS BIGINT) FROM"
                 f" '{sf_dir}/customer.parquet'")
        .fetchall()
    ]
    n = len(vals)
    m = sum(vals) / n
    sd = math.sqrt(sum((v - m) ** 2 for v in vals) / (n - 1))
    devmax, devmin = max(vals) - m, m - min(vals)
    side = "max" if devmax >= devmin else "min"
    g = max(devmax, devmin) / sd
    (r,) = _run(spark, sf_dir, "customer_grubbs_acctbal")
    assert r["n_rows"] == n
    assert r["side"] == side
    assert r["extreme_cents"] == (max(vals) if side == "max" else min(vals))
    assert r["g_stat"] == pytest.approx(g, abs=2e-3)


def test_bm25_matches_textbook(spark, sf_dir):
    """BM25 recomputed with plain floats (no quantization): the
    micro-unit quantized ranking must agree on membership and order,
    and each score must sit within quantization bias of the float
    reference (|q| terms * 1e-6 each, plus idf milli-grain ~ tf-sum
    * 1e-3 relative)."""
    rows = _con(sf_dir).execute(
        "SELECT doc_id, text FROM documents"
    ).fetchall()
    tfs: dict[int, Counter] = {}
    for did, text in rows:
        tfs[did] = Counter(text.strip().split())
    n = len(rows)
    df: Counter = Counter()
    for c in tfs.values():
        df.update(c.keys())
    dl = {d: sum(c.values()) for d, c in tfs.items()}
    avgdl = sum(dl.values()) / n
    k1, b = 1.2, 0.75
    q = tfs[0]
    scores = {}
    for d, c in tfs.items():
        if d == 0:
            continue
        s = 0.0
        for t in q:
            tf = c.get(t, 0)
            if not tf:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
        if s > 0:
            scores[d] = s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _run(spark, sf_dir, "doc_bm25_topk")
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert r["bm25_micro"] / 1e6 == pytest.approx(s, rel=2e-3)


def test_mahalanobis_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = _con(sf_dir).execute(
        "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT),"
        " CAST(ROUND(l_extendedprice*100) AS BIGINT) FROM lineitem"
    ).fetchall()
    xy = np.array([(x, y) for _, _, x, y in rows], dtype=np.float64)
    mean = xy.mean(0)
    cov = np.cov(xy.T, bias=True)
    inv = np.linalg.inv(cov)
    d2 = np.einsum("ij,jk,ik->i", xy - mean, inv, xy - mean)
    order = sorted(
        range(len(rows)), key=lambda i: (-d2[i], rows[i][0], rows[i][1])
    )[:20]
    expect = [(rows[i][0], rows[i][1]) for i in order]
    got = _run(spark, sf_dir, "lineitem_mahalanobis_outliers")
    assert [(r["l_orderkey"], r["l_linenumber"]) for r in got] == expect
    for r, i in zip(got, order):
        assert r["mahal_sq"] == pytest.approx(d2[i], rel=1e-6, abs=1e-3)


def test_logrank_matches_textbook(spark, sf_dir):
    """Mantel log-rank recomputed in plain Python floats: per-user
    lifetimes + censoring from the raw parquet, hypergeometric O-E
    and variance per distinct day, no quantization."""
    import hashlib

    rows = _con(sf_dir).execute(
        "SELECT user_id,"
        " (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 86400000000,"
        " ((SELECT MAX(epoch_us(ts)) FROM events) - MAX(epoch_us(ts)))"
        "   < 43200000000"
        " FROM events GROUP BY user_id"
    ).fetchall()

    def variant(uid):
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16)
        return "A" if h % 1_000_000 < 500_000 else "B"

    lt = [(variant(u), t, c) for u, t, c in rows]
    days = sorted({t for _, t, _ in lt})
    oe = vv = 0.0
    deaths = 0
    for t in days:
        da = sum(1 for v, tt, c in lt if v == "A" and tt == t and not c)
        d = sum(1 for _, tt, c in lt if tt == t and not c)
        na = sum(1 for v, tt, _ in lt if v == "A" and tt >= t)
        nb = sum(1 for v, tt, _ in lt if v == "B" and tt >= t)
        n = na + nb
        if d > 0 and n >= 2:
            oe += da - d * na / n
            vv += d * (na / n) * (nb / n) * ((n - d) / (n - 1))
            deaths += d
    z = oe / math.sqrt(vv)
    (r,) = _run(spark, sf_dir, "events_variant_logrank")
    assert r["n_a"] == sum(1 for v, _, _ in lt if v == "A")
    assert r["n_b"] == sum(1 for v, _, _ in lt if v == "B")
    assert r["n_deaths"] == deaths
    assert r["logrank_z"] == pytest.approx(z, abs=2e-3)


def test_periodogram_matches_dft_bruteforce(spark, sf_dir):
    """Plain-float DFT over the day series (no quantized trig table):
    top-5 period set and order must agree, and power within the
    trig-quantization bias."""
    rows = _con(sf_dir).execute(
        "SELECT CAST(o_orderdate AS DATE) AS day,"
        " SUM(CAST(ROUND(o_totalprice) AS BIGINT)) FROM orders"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ys = [y for _, y in rows]
    n = len(ys)
    mean = sum(ys) / n
    powers = {}
    for p in range(2, 31):
        c = sum((y - mean) * math.cos(2 * math.pi * i / p)
                for i, y in enumerate(ys, start=1))
        s = sum((y - mean) * math.sin(2 * math.pi * i / p)
                for i, y in enumerate(ys, start=1))
        powers[p] = (c * c + s * s) / n
    top = sorted(powers, key=lambda p: (-powers[p], p))[:5]
    got = _run(spark, sf_dir, "daily_revenue_periodogram")
    assert [r["period_days"] for r in got] == top
    for r in got:
        assert r["power_norm"] == pytest.approx(
            powers[r["period_days"]], rel=1e-4
        )


def test_gumbel_matches_textbook(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS m,"
        " CAST(o_orderdate AS DATE) AS d,"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) AS c FROM orders"
    ).fetchall()
    daily: dict = {}
    for m, d, c in rows:
        daily[d] = daily.get(d, 0) + c
    peaks: dict = {}
    for d, y in daily.items():
        m = d.strftime("%Y-%m")
        peaks[m] = max(peaks.get(m, 0), y)
    xs = list(peaks.values())
    n = len(xs)
    mean = sum(xs) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl99 = mu - beta * math.log(-math.log(0.99))
    (r,) = _run(spark, sf_dir, "monthly_peak_gumbel")
    assert r["n_months"] == n
    assert r["mu_cents"] == pytest.approx(mu, rel=1e-9)
    assert r["beta_cents"] == pytest.approx(beta, rel=1e-9)
    assert r["rl99_cents"] == pytest.approx(rl99, rel=1e-9)


def test_brier_decomposition_matches_textbook(spark, sf_dir):
    rows = _con(sf_dir).execute(
        f"""
        SELECT c.c_custkey, c.c_acctbal,
               CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END
        FROM '{sf_dir}/customer.parquet' c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    rows.sort(key=lambda r: (r[1], r[0]))
    n = len(rows)
    scored = [((i) / (n - 1), y) for i, (_, _, y) in enumerate(rows)]
    brier = sum((s - y) ** 2 for s, y in scored) / n
    obar = sum(y for _, y in scored) / n
    bins: dict = {}
    for s, y in scored:
        b = min(int(s * 10), 9)
        bins.setdefault(b, []).append((s, y))
    rel = sum(
        len(v)
        * (sum(s for s, _ in v) / len(v) - sum(y for _, y in v) / len(v))
        ** 2
        for v in bins.values()
    ) / n
    res = sum(
        len(v) * (sum(y for _, y in v) / len(v) - obar) ** 2
        for v in bins.values()
    ) / n
    (r,) = _run(spark, sf_dir, "score_brier_decomposition")
    assert r["n_rows"] == n
    assert r["brier"] == pytest.approx(brier, abs=2e-6)
    assert r["reliability"] == pytest.approx(rel, abs=2e-6)
    assert r["resolution"] == pytest.approx(res, abs=2e-6)
    assert r["uncertainty"] == pytest.approx(obar * (1 - obar), abs=2e-6)
    # Murphy identity holds up to binning error
    assert abs(r["brier"] - (r["reliability"] - r["resolution"]
               + r["uncertainty"])) < 0.02


def test_covariance_drift_matches_numpy(spark, sf_dir):
    import hashlib

    import numpy as np

    rows = _con(sf_dir).execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000

    tr = np.floor(np.array(
        [e for i, e in rows if bucket(i) < 800000], dtype=np.float64) * 1e3)
    te = np.floor(np.array(
        [e for i, e in rows if bucket(i) >= 900000], dtype=np.float64) * 1e3)
    d = tr.T @ tr / len(tr) - te.T @ te / len(te)
    frob = float(np.sqrt((d * d).sum())) / 1e6
    (r,) = _run(spark, sf_dir, "embedding_covariance_drift")
    assert r["n_train"] == len(tr) and r["n_test"] == len(te)
    assert r["cov_frob_dist"] == pytest.approx(frob, rel=1e-5)


def test_qini_matches_bruteforce(spark, sf_dir):
    import hashlib

    rows = _con(sf_dir).execute(
        "SELECT user_id, COUNT(*),"
        " MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        " FROM events GROUP BY user_id"
    ).fetchall()

    def variant(u):
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        return "A" if h % 1_000_000 < 500_000 else "B"

    users = sorted(rows, key=lambda r: (-r[1], r[0]))
    n = len(users)
    q, rem = divmod(n, 10)
    sizes = [q + 1] * rem + [q] * (10 - rem)
    got = _run(spark, sf_dir, "variant_qini_curve")
    idx = 0
    nt = nc = ct = cc = 0
    for d, size in enumerate(sizes, start=1):
        for u, _, conv in users[idx:idx + size]:
            if variant(u) == "A":
                nt += 1
                ct += conv
            else:
                nc += 1
                cc += conv
        idx += size
        r = got[d - 1]
        assert (r["decile"], r["n_treat_cum"], r["n_ctrl_cum"],
                r["conv_treat_cum"], r["conv_ctrl_cum"]) == (d, nt, nc, ct, cc)
        if nc > 0:
            assert r["qini"] == pytest.approx(ct - cc * (nt / nc), abs=2e-3)


def test_fd_violations_match_bruteforce(spark, sf_dir):
    con = _con(sf_dir)
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{sf_dir}/nation.parquet'"
    )
    for fd, table, lhs, rhs in [
        ("orders: o_custkey -> o_orderpriority", "orders", "o_custkey",
         "o_orderpriority"),
        ("lineitem: l_partkey -> l_suppkey", "lineitem", "l_partkey",
         "l_suppkey"),
        ("lineitem: l_orderkey -> l_returnflag", "lineitem", "l_orderkey",
         "l_returnflag"),
        ("nation: n_nationkey -> n_regionkey", "nation", "n_nationkey",
         "n_regionkey"),
    ]:
        pairs = con.execute(
            f"SELECT {lhs}, {rhs} FROM {table}"
        ).fetchall()
        m: dict = {}
        for a, b in pairs:
            m.setdefault(a, set()).add(b)
        (r,) = [
            x for x in _run(spark, sf_dir, "fd_violation_report")
            if x["fd"] == fd
        ]
        assert r["n_lhs"] == len(m)
        assert r["n_violating"] == sum(1 for v in m.values() if len(v) > 1)
        assert r["max_rhs_per_lhs"] == max(len(v) for v in m.values())


def test_xyz_matches_bruteforce(spark, sf_dir):
    rows = _con(sf_dir).execute(
        """
        SELECT l_partkey, STRFTIME(CAST(o.o_orderdate AS DATE), '%Y-%m'),
               SUM(CAST(l_quantity AS BIGINT))
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
        """
    ).fetchall()
    months = {m for _, m, _ in rows}
    per: dict = {}
    for pk, _, q in rows:
        per.setdefault(pk, []).append(q)
    cls: dict = {}
    for pk, qs in per.items():
        if sum(qs) <= 0:
            continue
        n = len(qs)
        if n >= 2:
            mean = sum(qs) / n
            sd = math.sqrt(sum((q - mean) ** 2 for q in qs) / (n - 1))
            cv = sd / mean
        else:
            cv = 0.0
        c = "X" if cv < 0.5 else ("Y" if cv < 1.0 else "Z")
        cls.setdefault(c, []).append((cv, n))
    got = _run(spark, sf_dir, "part_demand_xyz")
    assert [r["xyz_class"] for r in got] == sorted(cls)
    for r in got:
        v = cls[r["xyz_class"]]
        assert r["n_parts"] == len(v)
        assert r["mean_cv"] == pytest.approx(
            sum(c for c, _ in v) / len(v), abs=2e-6
        )
        assert r["mean_activity"] == pytest.approx(
            sum(n for _, n in v) / (len(v) * len(months)), abs=2e-6
        )


def test_sprt_matches_textbook(spark, sf_dir):
    import hashlib

    rows = _con(sf_dir).execute(
        """
        SELECT user_id, CAST(MIN(ts) AS DATE),
               MAX(CASE WHEN event_type = 'purchase'
                         AND epoch_us(ts) - first_us < 86400000000
                        THEN 1 ELSE 0 END)
        FROM (SELECT user_id, event_type, ts,
                     MIN(epoch_us(ts)) OVER (PARTITION BY user_id)
                       AS first_us
              FROM events)
        GROUP BY user_id
        """
    ).fetchall()
    p0 = sum(c for _, _, c in rows) / len(rows)
    p1 = min(p0 * 1.1, 0.999999)
    lr1, lr0 = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))

    def variant(u):
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        return "A" if h % 1_000_000 < 500_000 else "B"

    daily: dict = {}
    for u, d, c in rows:
        if variant(u) == "B":
            nb, cb = daily.get(d, (0, 0))
            daily[d] = (nb + 1, cb + c)
    got = _run(spark, sf_dir, "variant_sprt_trace")
    nb_c = cb_c = 0
    assert len(got) == len(daily)
    for r, d in zip(got, sorted(daily)):
        nb, cb = daily[d]
        nb_c += nb
        cb_c += cb
        assert r["day"] == d.strftime("%Y-%m-%d")
        assert (r["n_b_cum"], r["conv_b_cum"]) == (nb_c, cb_c)
        llr = cb_c * lr1 + (nb_c - cb_c) * lr0
        assert r["llr"] == pytest.approx(llr, abs=2e-3)
        want = ("reject_h0" if llr >= math.log(19)
                else "accept_h0" if llr <= -math.log(19) else "continue")
        assert r["decision"] == want


def test_markov_perplexity_matches_bruteforce(spark, sf_dir):
    import hashlib

    rows = _con(sf_dir).execute(
        """
        SELECT user_id, cur_type, next_type FROM (
          SELECT user_id, event_type AS cur_type,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS next_type
          FROM events) WHERE next_type IS NOT NULL
        """
    ).fetchall()

    def variant(u):
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        return "A" if h % 1_000_000 < 500_000 else "B"

    train: Counter = Counter()
    test: Counter = Counter()
    for u, c, nx in rows:
        (train if variant(u) == "A" else test)[(c, nx)] += 1
    # states = cur_types observed in pairs (either split)
    states = sorted({c for (c, _), _ in (train | test).items()})
    rowsum = {
        c: sum(train.get((c, nx), 0) + 1 for nx in states) for c in states
    }
    nll = 0.0
    n = 0
    for (c, nx), cnt in test.items():
        p = (train.get((c, nx), 0) + 1) / rowsum[c]
        nll += cnt * -math.log(p)
        n += cnt
    ce = nll / n
    (r,) = _run(spark, sf_dir, "events_markov_perplexity")
    assert r["n_states"] == len(states)
    assert r["n_test_transitions"] == n
    assert r["cross_entropy"] == pytest.approx(ce, abs=2e-6)
    assert r["perplexity"] == pytest.approx(math.exp(ce), abs=2e-3)


def test_reconciliation_matches_bruteforce(spark, sf_dir):
    rows = _con(sf_dir).execute(
        """
        SELECT o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT),
               l.l_extendedprice, l.l_discount, l.l_tax
        FROM orders o LEFT JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    per: dict = {}
    for ok, oc, ep, disc, tax in rows:
        lc, n = per.get(ok, (0, 0))
        if ep is not None:
            lc += int(round(ep * (1 - disc) * (1 + tax) * 100 + 1e-9))
            n += 1
        per[ok] = (lc, n)
        per.setdefault((ok, "oc"), oc)
    bands: dict = {}
    for ok, v in per.items():
        if isinstance(ok, tuple):
            continue
        lc, n = v
        oc = per[(ok, "oc")]
        d = abs(oc - lc)
        band = ("4_no_lines" if n == 0 else "0_exact" if oc == lc
                else "1_within_0.1pct" if d * 1000 <= oc
                else "2_within_1pct" if d * 100 <= oc
                else "3_over_1pct")
        bands.setdefault(band, []).append((d, oc))
    got = _run(spark, sf_dir, "order_line_reconciliation")
    assert [r["band"] for r in got] == sorted(bands)
    for r in got:
        v = bands[r["band"]]
        assert r["n_orders"] == len(v)
        assert r["max_abs_diff_cents"] == max(d for d, _ in v)
        assert r["mean_rel_diff"] == pytest.approx(
            sum(d / oc for d, oc in v) / len(v), abs=2e-6
        )


def test_qq_table_matches_numpy(spark, sf_dir):
    import numpy as np

    con = _con(sf_dir)
    u = np.array([c for (c,) in con.execute(
        "SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
        " WHERE o_orderpriority = '1-URGENT'").fetchall()])
    lo = np.array([c for (c,) in con.execute(
        "SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
        " WHERE o_orderpriority = '5-LOW'").fetchall()])
    ps = [round(0.05 * i, 2) for i in range(1, 20)]
    got = _run(spark, sf_dir, "qq_priority_totalprice")
    assert [r["p"] for r in got] == ps
    for r, p in zip(got, ps):
        qu = float(np.percentile(u, p * 100, method="linear"))
        ql = float(np.percentile(lo, p * 100, method="linear"))
        assert r["q_urgent_cents"] == pytest.approx(qu, abs=2e-3)
        assert r["q_low_cents"] == pytest.approx(ql, abs=2e-3)
        assert r["qq_ratio"] == pytest.approx(ql / qu, abs=2e-5)
