"""Deterministic mergeable sketches, oracle-backed cross-engine.

The bounded-memory summaries a 100 TB pipeline actually ships —
cardinality (HyperLogLog) and frequency (count-min) — but built so
the SAME sketch comes out of any engine: every hash is md5 on a
canonical string, every register/cell update is an integer MAX/SUM,
and the only float in either output is produced by ONE multiply-free
correctly-rounded divide of exact integers. That upgrades the sketch
family from the "rows-only, engine-specific estimate" class
(`approx_distinct_users`, `approx_quantile_profile`, which wrap
Spark's native HLL++/KLL) to full three-way oracle checks: the
DuckDB oracle recomputes the identical registers/cells and must
hash-match bit-for-bit.

Scale design (100 TB):
- Both sketches are MERGEABLE: HLL registers merge by per-bucket
  MAX, CMS cells by per-cell SUM — so the groupBy aggregations here
  are exactly the partial-aggregate (map-side combine) shape, and a
  per-partition/per-day sketch union is the same plan with one more
  grouping key. No shuffle carries raw values, only (bucket, rho) /
  (seed, col, cnt) pairs bounded by the sketch size.
- HLL: shuffle width per group is ≤ m=256 register rows — the
  cardinality path when exact COUNT(DISTINCT) would shuffle every
  distinct value (exact twin: `count_distinct`).
- CMS: cell table is d×w = 4×2048 rows regardless of key count;
  frequency estimates for any probe set are d lookups + a MIN. The
  exact-count probe join here doubles as the accuracy report.

Cross-engine determinism (PARITY.md toolkit): md5 → fixed hex
slices → BIGINT is the established integer-hash idiom
(`plans/relational.py:823` Bloom probes, `operators/sampling.py:59`
split buckets). Register rho uses LENGTH(BIN(tail)) — both engines
print minimal-width binary for positive BIGINTs, so
``52 - length(bin(tail)) + 1`` is the exact leading-zero rank of a
52-bit field in either engine (tail=0, probability 2^-52 per key,
pins to the max rank R=53). The HLL harmonic sum is computed as the
exact integer Z·2^53 = Σ 2^(53-rho) via bit shifts (≤ m·2^53 = 2^61
< 2^63), and the raw estimate alpha_m·m²/Z is ONE divide of a baked
float literal by that exact integer — IEEE-CR, bit-identical in any
engine. No small-range linear-counting branch: it would need an
engine-library ln(); the zero-register count is emitted instead so
a consumer can apply any correction, and the raw estimate stays
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table

# --- HyperLogLog parameters -------------------------------------------------
_HLL_P = 8  # bucket bits (first 2 hex chars)
_HLL_M = 1 << _HLL_P  # 256 registers
_HLL_R = 53  # max rho rank for a 52-bit tail
# alpha_m for m >= 128 (Flajolet et al. 2007), baked to an exact
# Python float so both SQL dialects carry the identical literal.
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_C = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_R)

# --- count-min parameters ---------------------------------------------------
_CMS_D = 4  # hash rows
_CMS_W = 2048  # columns per row
_CMS_TOPK = 10  # probe set size


def _hll_sql(table: str, grp: str, key: str) -> str:
    """Dialect-portable HLL register + estimate SQL.

    ``CAST(concat('0x', …) AS BIGINT)`` parses hex in DuckDB; the
    Spark side uses conv() instead, but the register/mask/shift
    arithmetic below is shared verbatim by both builders.
    """
    return f"""
    WITH h AS (
      SELECT {grp} AS grp,
             CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 2)) AS BIGINT) AS bucket,
             CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 3, 13)) AS BIGINT) AS tail
      FROM {table}
    ),
    regs AS (
      SELECT grp, bucket,
             MAX(CASE WHEN tail = 0 THEN {_HLL_R}
                      ELSE 52 - length(bin(tail)) + 1 END) AS rho
      FROM h GROUP BY grp, bucket
    ),
    z AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS n_nonzero,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_R} - rho)) AS BIGINT) AS s_nonzero,
             CAST(MAX(rho) AS BIGINT) AS max_rho
      FROM regs GROUP BY grp
    )
    SELECT grp,
           CAST({_HLL_M} - n_nonzero AS BIGINT) AS n_zero_registers,
           max_rho,
           CAST(s_nonzero + ({_HLL_M} - n_nonzero)
                * (CAST(1 AS BIGINT) << {_HLL_R}) AS BIGINT) AS z_scaled,
           {_HLL_C!r} / CAST(s_nonzero + ({_HLL_M} - n_nonzero)
                * (CAST(1 AS BIGINT) << {_HLL_R}) AS DOUBLE) AS raw_estimate
    FROM z
    ORDER BY grp
    """


@query(
    "hll_sketch_estimate",
    _hll_sql("orders", "o_orderpriority", "o_custkey"),
    doc="Deterministic HyperLogLog (p=8, m=256) distinct-customer "
    "estimate per order priority: md5-bucketed registers, exact "
    "integer harmonic sum Z·2^53 via bit shifts, one CR divide for "
    "the raw estimate — the SAME sketch bits in Spark and DuckDB, so "
    "the estimate itself is oracle-checked (unlike the engine-"
    "specific `approx_distinct_users` HLL++ wrapper; exact twin "
    "`count_distinct`). Mergeable: registers union by per-bucket "
    "MAX, so per-partition sketches combine without raw-value "
    "reshuffle — the 100 TB cardinality path.",
)
def q_hll_sketch_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    key = F.md5(F.col("o_custkey").cast("string"))
    h = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("long").alias("bucket"),
        F.conv(F.substring(key, 3, 13), 16, 10).cast("long").alias("tail"),
    )
    regs = h.groupBy("grp", "bucket").agg(
        F.max(
            F.when(F.col("tail") == 0, F.lit(_HLL_R)).otherwise(
                F.lit(52) - F.length(F.bin(F.col("tail"))) + F.lit(1)
            )
        ).alias("rho")
    )
    z = regs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_nonzero"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_R} - rho)"))
        .cast("long")
        .alias("s_nonzero"),
        F.max("rho").cast("long").alias("max_rho"),
    )
    z_scaled = F.col("s_nonzero") + (F.lit(_HLL_M) - F.col("n_nonzero")) * F.lit(
        1 << _HLL_R
    ).cast("long")
    return z.select(
        "grp",
        (F.lit(_HLL_M) - F.col("n_nonzero")).cast("long").alias("n_zero_registers"),
        "max_rho",
        z_scaled.cast("long").alias("z_scaled"),
        (F.lit(_HLL_C) / z_scaled.cast("double")).alias("raw_estimate"),
    )


def _cms_sql() -> str:
    """Count-min accuracy report over lineitem part frequencies.

    Exact per-key counts feed the sketch (the scalable formulation:
    one map-side-combined groupBy on the key, then d hashes per
    DISTINCT key — raw rows never fan out d-fold), cells are
    (seed, col) integer sums, and the probe set is the exact top-k
    (deterministic count-desc/key tiebreak). Output compares the CMS
    point estimate (MIN over d cells) to the exact count — the
    overestimate-only guarantee made visible.
    """
    seeds = ", ".join(f"({i})" for i in range(_CMS_D))
    return f"""
    WITH kc AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    ),
    hashed AS (
      SELECT s.i AS seed,
             (CAST(concat('0x', substr(md5(concat(CAST(k AS VARCHAR), 'cm', CAST(s.i AS VARCHAR))), 1, 8)) AS BIGINT)
              % {_CMS_W}) AS col,
             k, cnt
      FROM kc CROSS JOIN (VALUES {seeds}) s(i)
    ),
    cells AS (
      SELECT seed, col, CAST(SUM(cnt) AS BIGINT) AS cell
      FROM hashed GROUP BY seed, col
    ),
    probes AS (
      SELECT k, cnt FROM kc
      ORDER BY cnt DESC, k LIMIT {_CMS_TOPK}
    )
    SELECT p.k AS l_partkey,
           p.cnt AS exact_cnt,
           CAST(MIN(c.cell) AS BIGINT) AS cms_estimate
    FROM probes p
    JOIN hashed h ON h.k = p.k
    JOIN cells c ON c.seed = h.seed AND c.col = h.col
    GROUP BY p.k, p.cnt
    ORDER BY exact_cnt DESC, l_partkey
    """


@query(
    "cms_frequency_estimates",
    _cms_sql(),
    doc="Count-min sketch (d=4, w=2048) frequency estimates for the "
    "top-10 part keys vs their exact counts — all-integer md5 cells, "
    "engine-identical by construction. The cell table is d·w rows "
    "regardless of key cardinality and merges by per-cell SUM, so "
    "per-day/per-partition sketches combine without touching raw "
    "rows; the probe join is a broadcast of a fixed-size list. The "
    "100 TB frequency path when exact per-key counts don't fit "
    "(exact twin: `heavy_hitter_tokens` Misra-Gries + recount).",
)
def q_cms_frequency_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    kc = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    seeds = F.array(*[F.lit(i) for i in range(_CMS_D)])
    hashed = kc.select(
        "k", "cnt", F.explode(seeds).alias("seed")
    ).withColumn(
        "col",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("k").cast("string"),
                        F.lit("cm"),
                        F.col("seed").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W,
    )
    cells = hashed.groupBy("seed", "col").agg(
        F.sum("cnt").cast("long").alias("cell")
    )
    probes = kc.orderBy(F.desc("cnt"), F.asc("k")).limit(_CMS_TOPK)
    # d·topk = 40 probe lookups broadcast INTO the cell table — the
    # probe side is the tiny one however big the key space gets.
    probe_hashes = hashed.join(F.broadcast(probes.select("k")), on="k")
    est = (
        cells.join(F.broadcast(probe_hashes), on=["seed", "col"])
        .groupBy(F.col("k").alias("l_partkey"), F.col("cnt").alias("exact_cnt"))
        .agg(F.min("cell").cast("long").alias("cms_estimate"))
    )
    return est.orderBy(F.desc("exact_cnt"), F.asc("l_partkey"))


# --- KMV (k-minimum-values) distinct sketch with set algebra ----------------
#
# The third mergeable-summary shape: where HLL answers "how many
# distinct" per group, KMV additionally supports UNION and
# INTERSECTION cardinalities across sketches (Beyer et al., SIGMOD'07
# "On synopses for distinct-value estimation under multiset
# operations") — union by merging hash sets and re-trimming to the k
# smallest, intersection via the Jaccard fraction observed inside the
# union's k-minimum window. Estimator: |S| ~= (k-1) * H / h_(k) where
# h_(k) is the k-th smallest of distinct 52-bit md5 hashes and
# H = 2^52 is the hash range. All sketch state is integer; each
# estimate is one CR divide of exact-int casts, so the whole report
# is oracle-hashable bit-for-bit. The exact COUNT(DISTINCT) triple
# rides along as the accuracy report (same pattern as the CMS probe
# table).
#
# Scale (100 TB): per-side k-minimum sets come from TakeOrdered-style
# top-k (per-partition k-smallest, merge k·P candidates on one
# node-bounded reduce) — no global sort, no full distinct shuffle for
# the sketch itself; set ops touch only 3k hashes.

_KMV_K = 64
_KMV_BITS = 52
_KMV_NUM = (_KMV_K - 1) * (1 << _KMV_BITS)  # (k-1)·H, exact < 2^58


def _kmv_hash_sql(key: str) -> str:
    return f"CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 13)) AS BIGINT)"


def _kmv_sql() -> str:
    h = _kmv_hash_sql("o_custkey")
    return f"""
    WITH a AS (
      SELECT DISTINCT {h} AS h FROM orders WHERE o_orderstatus = 'F'
    ),
    b AS (
      SELECT DISTINCT {h} AS h FROM orders WHERE o_orderstatus = 'O'
    ),
    ka AS (SELECT MAX(h) AS kth FROM (SELECT h FROM a ORDER BY h LIMIT {_KMV_K}) t),
    kb AS (SELECT MAX(h) AS kth FROM (SELECT h FROM b ORDER BY h LIMIT {_KMV_K}) t),
    uk AS (
      SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) u
      ORDER BY h LIMIT {_KMV_K}
    ),
    ku AS (SELECT MAX(h) AS kth FROM uk),
    ix AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_in_both FROM uk
      WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)
    ),
    exact AS (
      SELECT CAST(COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS BIGINT) AS exact_a,
             CAST(COUNT(DISTINCT CASE WHEN o_orderstatus = 'O' THEN o_custkey END) AS BIGINT) AS exact_b,
             CAST(COUNT(DISTINCT CASE WHEN o_orderstatus IN ('F','O') THEN o_custkey END) AS BIGINT) AS exact_union
      FROM orders
    )
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(ka.kth AS BIGINT) AS kth_min_a,
           CAST(kb.kth AS BIGINT) AS kth_min_b,
           CAST(ku.kth AS BIGINT) AS kth_min_union,
           ix.n_in_both,
           CAST({_KMV_NUM} AS DOUBLE) / CAST(ka.kth AS DOUBLE) AS est_a,
           CAST({_KMV_NUM} AS DOUBLE) / CAST(kb.kth AS DOUBLE) AS est_b,
           CAST({_KMV_NUM} AS DOUBLE) / CAST(ku.kth AS DOUBLE) AS est_union,
           exact.exact_a, exact.exact_b, exact.exact_union
    FROM ka, kb, ku, ix, exact
    """


@query(
    "kmv_set_cardinality",
    _kmv_sql(),
    doc="KMV distinct sketch (k=64, 52-bit md5 hashes) over the "
    "F-status vs O-status customer sets: per-side and UNION "
    "cardinality estimates ((k-1)·H / h_(k), one CR divide each) "
    "plus the Jaccard numerator inside the union's k-minimum window "
    "— the mergeable synopsis that answers set-algebra cardinality "
    "questions HLL cannot (Beyer et al. SIGMOD'07). Exact "
    "COUNT(DISTINCT) triple rides along as the accuracy report. "
    "Sketch state is 3·k integers; per-side k-minima come from "
    "TakeOrdered top-k, no full distinct shuffle.",
)
def q_kmv_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    h = F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    hashed = o.select("o_orderstatus", h.alias("h"))
    a = hashed.filter(F.col("o_orderstatus") == "F").select("h").distinct()
    b = hashed.filter(F.col("o_orderstatus") == "O").select("h").distinct()
    ka = a.orderBy("h").limit(_KMV_K).agg(F.max("h").alias("kth_a"))
    kb = b.orderBy("h").limit(_KMV_K).agg(F.max("h").alias("kth_b"))
    uk = a.union(b).distinct().orderBy("h").limit(_KMV_K).cache()
    ku = uk.agg(F.max("h").alias("kth_u"))
    n_in_both = (
        uk.join(a, "h", "left_semi")
        .join(b, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_in_both"))
    )
    exact = o.agg(
        F.count_distinct(
            F.when(F.col("o_orderstatus") == "F", F.col("o_custkey"))
        ).cast("long").alias("exact_a"),
        F.count_distinct(
            F.when(F.col("o_orderstatus") == "O", F.col("o_custkey"))
        ).cast("long").alias("exact_b"),
        F.count_distinct(
            F.when(F.col("o_orderstatus").isin("F", "O"), F.col("o_custkey"))
        ).cast("long").alias("exact_union"),
    )
    num = F.lit(_KMV_NUM).cast("double")
    return (
        ka.crossJoin(kb)
        .crossJoin(ku)
        .crossJoin(n_in_both)
        .crossJoin(exact)
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            F.col("kth_a").alias("kth_min_a"),
            F.col("kth_b").alias("kth_min_b"),
            F.col("kth_u").alias("kth_min_union"),
            "n_in_both",
            (num / F.col("kth_a").cast("double")).alias("est_a"),
            (num / F.col("kth_b").cast("double")).alias("est_b"),
            (num / F.col("kth_u").cast("double")).alias("est_union"),
            "exact_a",
            "exact_b",
            "exact_union",
        )
    )


# --- AMS/AGMS sketch: second frequency moment + join-size estimation --------
#
# The fourth mergeable-summary shape: tug-of-war sketches (Alon,
# Matias & Szegedy, STOC'96; the AGMS join-size form of Alon, Gionis,
# Matias & Szegedy) answer SIZE-OF-JOIN and self-join (F2) questions
# from constant state: per seed i, X_i = Σ_v f(v)·s_i(v) with
# four-wise-independent ±1 signs; E[X_i²] = F2 and E[X_i·Y_i] = the
# equi-join size Σ_v fA(v)·fB(v). Here the signs come from an md5
# parity bit, each X_i is an exact BIGINT, and the only float in the
# output is one CR divide (Σ over d seeds) / d — same determinism
# contract as the HLL/CMS/KMV trio. Sketch state is d integers per
# side and merges by per-seed SUM (f is additive under s_i), so
# per-partition sketches combine with no key shuffle — the cardinal
# input to a cost-based join planner at 100 TB, where computing the
# exact join size to DECIDE a join strategy would cost the join
# itself. Exact values ride along as the accuracy report.

_AMS_D = 16  # independent sign seeds


def _ams_sign_sql(key, seed: str) -> str:
    return (
        f"(1 - 2 * (CAST(concat('0x', substr(md5(concat(CAST({key} AS VARCHAR),"
        f" 'ams', CAST({seed} AS VARCHAR))), 1, 1)) AS BIGINT) % 2))"
    )


def _ams_sql() -> str:
    seeds = ", ".join(f"({i})" for i in range(_AMS_D))
    return f"""
    WITH lc AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS f FROM lineitem GROUP BY l_partkey
    ),
    lo AS (
      SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS f FROM lineitem GROUP BY l_orderkey
    ),
    oo AS (
      SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS f
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderkey
    ),
    sk_part AS (
      SELECT s.i AS seed, CAST(SUM(f * {_ams_sign_sql('k', 's.i')}) AS BIGINT) AS x
      FROM lc CROSS JOIN (VALUES {seeds}) s(i) GROUP BY s.i
    ),
    sk_lo AS (
      SELECT s.i AS seed, CAST(SUM(f * {_ams_sign_sql('k', 's.i')}) AS BIGINT) AS x
      FROM lo CROSS JOIN (VALUES {seeds}) s(i) GROUP BY s.i
    ),
    sk_oo AS (
      SELECT s.i AS seed, CAST(SUM(f * {_ams_sign_sql('k', 's.i')}) AS BIGINT) AS x
      FROM oo CROSS JOIN (VALUES {seeds}) s(i) GROUP BY s.i
    ),
    f2 AS (
      SELECT CAST(SUM(a.x * a.x) AS BIGINT) AS acc FROM sk_part a
    ),
    js AS (
      SELECT CAST(SUM(a.x * b.x) AS BIGINT) AS acc
      FROM sk_lo a JOIN sk_oo b ON a.seed = b.seed
    ),
    f2_exact AS (SELECT CAST(SUM(f * f) AS BIGINT) AS v FROM lc),
    js_exact AS (
      SELECT CAST(SUM(a.f * b.f) AS BIGINT) AS v
      FROM lo a JOIN oo b ON a.k = b.k
    )
    SELECT 'f2_partkey_selfjoin' AS kind,
           CAST({_AMS_D} AS BIGINT) AS d,
           f2.acc AS sketch_acc,
           CAST(f2.acc AS DOUBLE) / {_AMS_D} AS estimate,
           f2_exact.v AS exact_size
    FROM f2, f2_exact
    UNION ALL
    SELECT 'joinsize_lineitem_orders_F' AS kind,
           CAST({_AMS_D} AS BIGINT) AS d,
           js.acc AS sketch_acc,
           CAST(js.acc AS DOUBLE) / {_AMS_D} AS estimate,
           js_exact.v AS exact_size
    FROM js, js_exact
    ORDER BY kind
    """


@query(
    "ams_join_size_estimate",
    _ams_sql(),
    doc=f"AMS tug-of-war sketch (d={_AMS_D} md5 ±1 sign seeds): the "
    "self-join size (second frequency moment) of l_partkey and the "
    "equi-join size |lineitem ⋈ F-status orders| estimated from d "
    "exact-integer sketch sums (one CR divide each), with the exact "
    "sizes alongside — the constant-state join-cardinality input a "
    "cost-based planner needs BEFORE paying for the join. Mergeable "
    "by per-seed SUM; both exact twins run as plain count-join "
    "aggregates in the same plan.",
)
def q_ams_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    oo = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")

    def counts(df, key):
        return df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("f")
        )

    def sketch(kc):
        seeds = F.array(*[F.lit(i) for i in range(_AMS_D)])
        sign = F.lit(1) - 2 * (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("k").cast("string"),
                            F.lit("ams"),
                            F.col("seed").cast("string"),
                        )
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("long")
            % 2
        )
        # Explicit repartition before the d-way seed fan-out: the
        # key-count frame is small, so AQE coalesces the groupBy
        # output to one partition and the d×|keys| md5 pass would run
        # on one core (the single-split stall class; explicit
        # REPARTITION_BY_NUM is never coalesced).
        par = kc.sparkSession.sparkContext.defaultParallelism
        return (
            kc.repartition(par, "k")
            .select("k", "f", F.explode(seeds).alias("seed"))
            .groupBy("seed")
            .agg(F.sum(F.col("f") * sign).cast("long").alias("x"))
        )

    lc, lo, of = counts(li, "l_partkey"), counts(li, "l_orderkey"), counts(oo, "o_orderkey")
    sk_part, sk_lo, sk_oo = sketch(lc), sketch(lo), sketch(of)
    f2_acc = sk_part.agg(F.sum(F.col("x") * F.col("x")).cast("long").alias("acc"))
    js_acc = (
        sk_lo.alias("a")
        .join(sk_oo.alias("b"), "seed")
        .agg(F.sum(F.col("a.x") * F.col("b.x")).cast("long").alias("acc"))
    )
    f2_exact = lc.agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("v"))
    js_exact = (
        lo.alias("a")
        .join(of.alias("b"), "k")
        .agg(F.sum(F.col("a.f") * F.col("b.f")).cast("long").alias("v"))
    )

    def report(kind, acc_df, exact_df):
        return (
            acc_df.crossJoin(exact_df)
            .select(
                F.lit(kind).alias("kind"),
                F.lit(_AMS_D).cast("long").alias("d"),
                F.col("acc").alias("sketch_acc"),
                (F.col("acc").cast("double") / F.lit(_AMS_D)).alias("estimate"),
                F.col("v").alias("exact_size"),
            )
        )

    return (
        report("f2_partkey_selfjoin", f2_acc, f2_exact)
        .unionByName(report("joinsize_lineitem_orders_F", js_acc, js_exact))
        .orderBy("kind")
    )


# --- mergeable histogram (equi-width) quantile sketch -----------------------
#
# The quantile member of the deterministic-sketch family: a fixed
# equi-width histogram over [min, max] is the simplest MERGEABLE
# quantile summary (cells merge by per-bin SUM — per-partition/
# per-day histograms combine with no raw-value shuffle), and unlike
# the engine-native KLL/t-digest (`approx_quantile_profile`,
# rows-only by necessity) every number here is engine-identical:
# bin ids are floor((x-lo)·NB/(hi-lo)) — a sub/mul/div/floor CR
# sequence on bit-identical parquet doubles — rank targets are exact
# integer ceilings of q·N computed as (N·qn + qd − 1) div qd, and the
# within-bin interpolation is the identical CR expression on both
# sides, so even the interpolated DOUBLE estimates hash-match.
# Error bound: rank exact to the bin, value within one bin width
# (range/256 here) — the classic histogram trade-off; exact twin
# `quantile_profile`, engine-sketch twin `approx_quantile_profile`.

_HQ_BINS = 256


def _histo_quantile_sql(idiv: str) -> str:
    return f"""
    WITH b AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR((l_extendedprice - b.lo) * {_HQ_BINS} / (b.hi - b.lo)) AS BIGINT),
                   {_HQ_BINS - 1}) AS bin
      FROM lineitem CROSS JOIN b
    ),
    cells AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM binned GROUP BY bin),
    cdf AS (
      SELECT bin, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
      FROM cells
    ),
    targets AS (
      SELECT q.label, CAST((b.n_rows * q.qn + q.qd - 1) {idiv} q.qd AS BIGINT) AS target
      FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)) q(label, qn, qd)
      CROSS JOIN b
    ),
    pick AS (
      SELECT t.label, t.target, MIN(c.bin) AS bin
      FROM targets t JOIN cdf c ON c.cum >= t.target
      GROUP BY t.label, t.target
    )
    SELECT p.label, p.target AS target_rank, p.bin,
           c.cnt AS bin_count,
           b.lo + (p.bin + CAST(p.target - (c.cum - c.cnt) AS DOUBLE) / c.cnt)
                * ((b.hi - b.lo) / {_HQ_BINS}) AS q_estimate
    FROM pick p JOIN cdf c ON c.bin = p.bin CROSS JOIN b
    ORDER BY p.label
    """


@query(
    "histogram_quantile_sketch",
    _histo_quantile_sql("//"),
    doc=f"Mergeable equi-width histogram quantile sketch ({_HQ_BINS} "
    "bins over [min, max] of l_extendedprice): p50/p90/p99 from the "
    "binned CDF with exact integer rank targets and CR within-bin "
    "interpolation — value error ≤ one bin width, every output "
    "engine-identical (unlike the KLL `approx_quantile_profile`, "
    "which is rows-only by necessity). Bins merge by per-bin SUM — "
    "the per-partition quantile path with no raw-value shuffle; "
    "exact twin `quantile_profile`.",
)
def q_histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    return spark.sql(
        _histo_quantile_sql("div").replace("FROM lineitem", "FROM {lineitem}"),
        lineitem=li,
    )
