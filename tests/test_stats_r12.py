"""Round-12 operators vs independent pure-Python references.

The DuckDB oracles mirror each query's algebra; these tests recompute
the statistics a THIRD way (brute-force Python over the sf0.001
parquet, textbook formulas — no shared SQL, no shared Spark plan) so
a mirrored mistake in both the plan and its oracle cannot hide."""

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
    for t in ("orders", "lineitem", "events", "documents", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_kendall_tau_matches_bruteforce_pairs(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT CAST(ROUND(l_quantity) AS BIGINT),"
        " CAST(ROUND(l_discount*100) AS BIGINT) FROM lineitem"
    ).fetchall()
    # brute-force over the contingency cells (the n² pair loop in
    # cell space — identical math, independent code path)
    cells = Counter(rows)
    items = list(cells.items())
    conc = disc = 0
    for i in range(len(items)):
        (q1, d1), c1 = items[i]
        for j in range(i + 1, len(items)):
            (q2, d2), c2 = items[j]
            s = (q1 - q2) * (d1 - d2)
            if s > 0:
                conc += c1 * c2
            elif s < 0:
                disc += c1 * c2
    n = len(rows)
    tq = Counter(q for q, _ in rows)
    td = Counter(d for _, d in rows)
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) for t in tq.values()) / 2
    n2 = sum(t * (t - 1) for t in td.values()) / 2
    tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    (r,) = _run(spark, sf_dir, "lineitem_kendall_tau")
    assert r["n_rows"] == n
    assert r["concordant"] == conc and r["discordant"] == disc
    assert r["tau_b"] == pytest.approx(tau, abs=2e-6)


def test_mood_median_counts_and_chi2(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    vals = sorted(c for _, c in rows)
    n = len(vals)
    h = (n - 1) * 0.5
    i0 = int(h)
    m = vals[i0] + (h - i0) * (vals[min(i0 + 1, n - 1)] - vals[i0])
    above = Counter(p for p, c in rows if c > m)
    below = Counter(p for p, c in rows if c <= m)
    pris = sorted(set(above) | set(below))
    ta, tb = sum(above.values()), sum(below.values())
    chi2 = 0.0
    for p in pris:
        r_tot = above[p] + below[p]
        for o, c in ((above[p], ta), (below[p], tb)):
            e = r_tot * c / n
            chi2 += (o - e) ** 2 / e
    (r,) = _run(spark, sf_dir, "orders_mood_median")
    assert r["n_orders"] == n
    assert r["dof"] == len(pris) - 1
    # the engine floor-quantizes per-cell terms to micro-units: the
    # statistic may sit up to 2k micro-units below the float value
    assert r["chi2"] == pytest.approx(chi2, abs=2e-5 + 1e-3)


def test_brownforsythe_matches_textbook(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for p, c in rows:
        groups.setdefault(p, []).append(c)
    devs: dict[str, list[float]] = {}
    for p, xs in groups.items():
        xs.sort()
        n = len(xs)
        h = (n - 1) * 0.5
        i0 = int(h)
        med = xs[i0] + (h - i0) * (xs[min(i0 + 1, n - 1)] - xs[i0])
        devs[p] = [abs(x - med) for x in xs]
    k = len(devs)
    n = sum(len(v) for v in devs.values())
    grand = sum(sum(v) for v in devs.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in devs.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in devs.values()
    )
    f_ref = ((n - k) / (k - 1)) * ssb / ssw
    (r,) = _run(spark, sf_dir, "priority_brownforsythe")
    assert r["k_groups"] == k and r["n_rows"] == n
    # the engine works on 2x-scaled integer deviations with floor
    # division — identical F up to the quantization of S²//n terms
    assert r["f_stat"] == pytest.approx(f_ref, rel=1e-4, abs=1e-3)


def test_runs_test_matches_bruteforce(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT CAST(o_orderdate AS DATE) dy,"
        " SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) c"
        " FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vals = sorted(c for _, c in rows)
    n = len(vals)
    h = (n - 1) * 0.5
    i0 = int(h)
    m = vals[i0] + (h - i0) * (vals[min(i0 + 1, n - 1)] - vals[i0])
    signs = [1 if c > m else 0 for _, c in rows if c != m]
    runs = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    ) if signs else 0
    n1, n2 = sum(signs), len(signs) - sum(signs)
    (r,) = _run(spark, sf_dir, "daily_revenue_runs_test")
    assert (r["n_above"], r["n_below"], r["n_runs"]) == (n1, n2, runs)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert r["z_stat"] == pytest.approx((runs - mu) / math.sqrt(var), abs=2e-4)


def test_variant_ztest_counts_and_z(spark, sf_dir):
    rows = _con(sf_dir).execute(
        """
        SELECT CASE WHEN CAST(concat('0x',
                 substr(md5(CAST(user_id AS VARCHAR)),1,8)) AS BIGINT)
                 % 1000000 < 500000 THEN 'A' ELSE 'B' END,
               MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
        FROM events GROUP BY user_id
        """
    ).fetchall()
    na = sum(1 for v, _ in rows if v == "A")
    nb = len(rows) - na
    ca = sum(c for v, c in rows if v == "A")
    cb = sum(c for v, c in rows if v == "B")
    (r,) = _run(spark, sf_dir, "events_variant_ztest")
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (na, nb, ca, cb)
    if na > 0 and nb > 0 and 0 < ca + cb < na + nb:
        p = (ca + cb) / (na + nb)
        z = (ca / na - cb / nb) / math.sqrt(
            p * (1 - p) * (1 / na + 1 / nb)
        )
        assert r["z_stat"] == pytest.approx(z, abs=2e-4)
    else:
        # degenerate split (tiny SF: every user converted) → sentinel
        assert r["z_stat"] == 0.0


def test_gopher_rules_bruteforce(spark, sf_dir):
    import re

    docs = _con(sf_dir).execute("SELECT text FROM documents").fetchall()
    stops = ("the", "a", "and", "of", "to", "in", "is", "that")
    fails = Counter()
    n_pass = 0
    for (text,) in docs:
        toks = re.split(r"\s+", text.strip())
        wc = len(toks)
        nonspace = len(re.sub(r"\s", "", text))
        lines = text.split("\n")
        f = {
            "fail_word_count": not (50 <= wc <= 100_000),
            "fail_mean_word_len": not (3 * wc <= nonspace <= 10 * wc),
            "fail_symbol_ratio": 10
            * (text.count("#") + text.count("..."))
            > wc,
            "fail_bullet_lines": 10
            * sum(1 for x in lines if re.match(r"^[-*•]", x))
            > len(lines),
            "fail_ellipsis_lines": 10
            * sum(1 for x in lines if re.search(r"\.\.\.$", x))
            > 3 * len(lines),
            "fail_alpha_words": 5
            * sum(1 for x in toks if re.search("[a-zA-Z]", x))
            < 4 * wc,
            "fail_stopwords": sum(1 for s in stops if s in toks) < 2,
        }
        for key, bad in f.items():
            fails[key] += bad
        n_pass += not any(f.values())
    (r,) = _run(spark, sf_dir, "doc_gopher_rules")
    assert r["n_docs"] == len(docs)
    for key in fails:
        assert r[key] == fails[key], key
    assert r["n_pass"] == n_pass


def test_dsir_weights_are_integer_microbits_and_ranked(spark, sf_dir):
    rows = _run(spark, sf_dir, "doc_dsir_importance")
    assert 0 < len(rows) <= 20
    ws = [(r["weight_microbits"], r["doc_id"]) for r in rows]
    assert ws == sorted(ws, key=lambda t: (-t[0], t[1]))
    assert all(isinstance(r["weight_microbits"], int) for r in rows)


def test_range_search_pairs_verify_above_tau(spark, sf_dir):
    rows = _run(spark, sf_dir, "embedding_query_range_search")
    for r in rows:
        assert r["anchor_id"] % 97 == 0
        assert r["anchor_id"] != r["vec_id"]
        assert r["cosine_sim"] >= 0.40


def test_theil_index_matches_bruteforce(spark, sf_dir):
    import math as _math

    rows = _con(sf_dir).execute(
        """
        SELECT c_mktsegment,
               SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c_mktsegment, c.c_custkey
        """
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for seg, cents in rows:
        groups.setdefault(seg, []).append(cents)
    got = {
        r["segment"]: r
        for r in _run(spark, sf_dir, "segment_theil_spend")
    }
    assert set(got) == set(groups)
    for seg, xs in groups.items():
        n, s = len(xs), sum(xs)
        theil = sum(x * _math.log(x * n / s) for x in xs) / s
        assert got[seg]["n_customers"] == n
        # engine value is micro-unit floor-quantized per distinct
        # value: within 1e-6 + rounding of the float reference
        assert got[seg]["theil_t"] == pytest.approx(theil, abs=2e-4)


def test_mood_median_and_brownforsythe_empty_orders(spark, sf_dir, tmp_path):
    """Empty-fact degradation must mirror the oracles' 1-row
    aggregate-over-empty semantics (r12 ADVICE): mood emits
    (NULL, NULL, NULL, -1) — COUNT(DISTINCT) of nothing is 0 so
    dof = -1 — and brown-forsythe (0, NULL, 0.0); neither may raise
    on the driver-folded literals."""
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .limit(0)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "orders.parquet"))
    )
    (m,) = _run(spark, str(tmp_path), "orders_mood_median")
    assert m["n_orders"] is None
    assert m["median_cents"] is None
    assert m["chi2"] is None
    assert m["dof"] == -1
    (b,) = _run(spark, str(tmp_path), "priority_brownforsythe")
    assert b["k_groups"] == 0
    assert b["n_rows"] is None
    assert b["f_stat"] == 0.0
