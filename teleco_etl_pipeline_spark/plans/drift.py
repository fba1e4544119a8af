"""Distribution-drift screens and resampling inference.

The reference warehouse validates landed data against FIXED rules
(`dags/SQL/DWH_Quality_Checks.sql` — existence, ranges, counts); a
production feature/training pipeline also needs to detect when the
DISTRIBUTION moves while every row still passes the rules: a price
mix shifting between years (PSI — the credit-scoring population-
stability index), a train/test token vocabulary diverging (Jensen-
Shannon divergence — symmetric, bounded, defined at zero counts
unlike raw KL), and uncertainty estimates computed IN the engine
rather than by collecting samples to the driver (the Poisson
bootstrap: Chamandy, Muralidharan, Najmi & Naidu, "Estimating
uncertainty for massive data streams", Google tech report 2012 —
each row joins each replicate with an independent Poisson(1)
multiplicity, so the B resamples are one partial-aggregated groupBy,
never B shuffles of the data).

Determinism contract (PARITY.md taxonomy): every rate/divergence is
a ratio of EXACT integer counts (cents, token counts, Poisson
weights from integer md5 thresholds baked as literals below);
doubles appear only in final display expressions under the shared
``ROUND(x + 1e-9, 4)`` guard, and every ranked output orders by the
ROUNDED value with a total tie-break, so a 1-ulp ``ln`` difference
between libm implementations can never reorder the report.

Scale notes (100 TB):
- PSI bins against BASELINE-period deciles (the standard scoring
  convention): the decile fit is one sort-based aggregate over the
  baseline slice, baked into the plan as a 1-row broadcast; binning
  is then a pure map (`size(filter(edges, e <= x))`), and the report
  aggregates 10 cells — no shuffle beyond the one groupBy.
- The JSD screen gates on heavy tokens (count*50 >= corpus tokens)
  BEFORE computing divergence terms, so the report is bounded by the
  heavy-hitter set however large the vocabulary.
- The Poisson bootstrap multiplies map rows by B (here 64) but each
  expanded row is (replicate, weight, cents) feeding a map-side
  combine into B partial sums — shuffle is B rows per partition.
  That is the point of the technique: resampling without resharding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table

_DEC = "decimal(38,0)"
_EPS = 1e-9

# --- population stability index (PSI) over baseline deciles -----------------

_PSI_SPLIT = "1998-01-01"
_PSI_QS = [i / 10.0 for i in range(1, 10)]


@query(
    "totalprice_psi_drift",
    f"""
    WITH base AS (
      SELECT o_totalprice AS p FROM orders
      WHERE o_orderdate < DATE '{_PSI_SPLIT}'
    ),
    edges AS (
      SELECT ROUND(UNNEST(quantile_cont(p, {_PSI_QS})) + 1e-9, 2) AS e
      FROM base
    ),
    binned AS (
      SELECT o_orderdate,
             (SELECT COUNT(*) FROM edges WHERE e <= o_totalprice) AS bin
      FROM orders
    ),
    cells AS (
      SELECT bin,
             SUM(CASE WHEN o_orderdate < DATE '{_PSI_SPLIT}'
                      THEN 1 ELSE 0 END) AS n_base,
             SUM(CASE WHEN o_orderdate >= DATE '{_PSI_SPLIT}'
                      THEN 1 ELSE 0 END) AS n_curr
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT SUM(n_base) AS tb, SUM(n_curr) AS tc FROM cells
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_curr AS BIGINT) AS n_curr,
           ROUND(((n_curr + 0.5) / (tc + 5.0) - (n_base + 0.5) / (tb + 5.0))
                 * LN(((n_curr + 0.5) / (tc + 5.0))
                      / ((n_base + 0.5) / (tb + 5.0))) + 1e-9, 4) AS psi_term
    FROM cells, tot
    ORDER BY bin
    """,
    doc="Population stability index of the order-price distribution, "
    "1995-97 baseline vs 1998+ current: bins are the BASELINE "
    "deciles (the scoring-industry convention — drift is measured "
    "against where the reference population sat), fit once as a "
    "1-row broadcast and applied as a pure map via "
    "size(filter(edges, e <= x)); per-bin PSI terms from smoothed "
    "(+0.5) exact counts. Sum of psi_term > 0.2 is the classic "
    "'population shifted' alarm.",
)
def q_totalprice_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from teleco_etl_pipeline_spark.operators.quantiles import (
        exact_percentiles,
        half_up,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderdate"
    )
    split = F.lit(_PSI_SPLIT).cast("date")
    # Baseline decile edges via the bounded-memory exact-percentile
    # machinery (operators.quantiles) — the previous ungrouped
    # F.percentile funneled every baseline price into ONE final-agg
    # buffer (the HBOS weak-#1 pattern, swept repo-wide in r11).
    # HALF_UP Decimal quantize replicates the engines' half-up
    # ROUND(e + 1e-9, 2) on the driver (the HBOS precedent).
    raw = exact_percentiles(
        o.filter(F.col("o_orderdate") < split), "o_totalprice", _PSI_QS
    )
    edges_lit = F.lit([half_up(e + _EPS, 2) for e in raw])
    cells = (
        o.select(
            F.size(
                F.filter(edges_lit, lambda e: e <= F.col("o_totalprice"))
            ).alias("bin"),
            (F.col("o_orderdate") < split).alias("is_base"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.col("is_base").cast("long")).alias("n_base"),
            F.sum((~F.col("is_base")).cast("long")).alias("n_curr"),
        )
    )
    tot = cells.agg(
        F.sum("n_base").alias("tb"), F.sum("n_curr").alias("tc")
    )
    pb = (F.col("n_base") + 0.5) / (F.col("tb") + 5.0)
    pc = (F.col("n_curr") + 0.5) / (F.col("tc") + 5.0)
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n_base").cast("long").alias("n_base"),
            F.col("n_curr").cast("long").alias("n_curr"),
            F.round((pc - pb) * F.log(pc / pb) + _EPS, 4).alias("psi_term"),
        )
        .orderBy("bin")
    )


# --- Jensen-Shannon divergence between split vocabularies -------------------

# Same md5-bucket split as sampling.q_doc_split_assign: train < 800k
# of 1M buckets, test >= 900k.
_JSD_BUCKET = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 1000000"
)
_JSD_GATE = 50  # heavy-token gate: count * 50 >= total tokens


@query(
    "split_token_jsd",
    rf"""
    WITH tok AS (
      SELECT CASE WHEN {_JSD_BUCKET} < 800000 THEN 'train'
                  WHEN {_JSD_BUCKET} >= 900000 THEN 'test' END AS split,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents
      WHERE {_JSD_BUCKET} < 800000 OR {_JSD_BUCKET} >= 900000
    ),
    cells AS (
      SELECT token,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
             SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS n_test
      FROM tok GROUP BY token
    ),
    tot AS (
      SELECT SUM(n_train) AS nt, SUM(n_test) AS ns,
             SUM(n_train + n_test) AS nall
      FROM cells
    ),
    terms AS (
      SELECT token, n_train, n_test,
             0.5 * (CASE WHEN n_train = 0 THEN 0.0
                         ELSE (n_train / CAST(nt AS DOUBLE))
                              * LN((n_train / CAST(nt AS DOUBLE))
                                   / (0.5 * (n_train / CAST(nt AS DOUBLE))
                                      + 0.5 * (n_test / CAST(ns AS DOUBLE))))
                    END
                    + CASE WHEN n_test = 0 THEN 0.0
                           ELSE (n_test / CAST(ns AS DOUBLE))
                                * LN((n_test / CAST(ns AS DOUBLE))
                                     / (0.5 * (n_train / CAST(nt AS DOUBLE))
                                        + 0.5 * (n_test / CAST(ns AS DOUBLE))))
                      END) AS term
      FROM cells, tot
      WHERE (n_train + n_test) * {_JSD_GATE} >= nall
    )
    SELECT token,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(n_test AS BIGINT) AS n_test,
           ROUND(term + 1e-9, 4) AS jsd_term
    FROM terms
    ORDER BY jsd_term DESC, token ASC
    """,
    doc="Jensen-Shannon divergence localization between the train and "
    "test vocabularies of the deterministic md5 split: per heavy "
    "token (count*50 >= corpus tokens — the report is bounded by the "
    "heavy-hitter set, not the vocabulary), the signed JSD "
    "contribution 0.5·[p·ln(p/m) + q·ln(q/m)]. Zero counts "
    "contribute only the surviving side (JSD, unlike KL, is finite "
    "there). Ordering is on the ROUNDED term with a token tie-break, "
    "so a 1-ulp libm ln difference can never reorder the report. "
    "A high term = a token whose rate differs between splits = "
    "leakage or skewed sharding.",
)
def q_split_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from teleco_etl_pipeline_spark.operators.sampling import hash_bucket
    from teleco_etl_pipeline_spark.sources.tables import ensure_min_splits

    # Small-file cliff guard before the md5-bucket + tokenize+explode
    # pass (r11: root-caused as the split_token_jsd ×4.7 sf1 grower —
    # the 5.9 MB documents file byte-splits to 2 of 32 cores and the
    # whole CPU-bound explode ran there; no-op at >= 1 split/core).
    docs = ensure_min_splits(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    b = hash_bucket("doc_id")
    tok = (
        docs.select(
            F.when(b < 800000, F.lit("train"))
            .when(b >= 900000, F.lit("test"))
            .alias("split"),
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
        )
        .filter(F.col("split").isNotNull())
    )
    cells = tok.groupBy("token").agg(
        F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
        F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
    )
    tot = cells.agg(
        F.sum("n_train").alias("nt"),
        F.sum("n_test").alias("ns"),
        F.sum(F.col("n_train") + F.col("n_test")).alias("nall"),
    )
    p = F.col("n_train") / F.col("nt").cast("double")
    q = F.col("n_test") / F.col("ns").cast("double")
    m = 0.5 * p + 0.5 * q
    term = 0.5 * (
        F.when(F.col("n_train") == 0, F.lit(0.0)).otherwise(
            p * F.log(p / m)
        )
        + F.when(F.col("n_test") == 0, F.lit(0.0)).otherwise(
            q * F.log(q / m)
        )
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("n_train") + F.col("n_test")) * _JSD_GATE
            >= F.col("nall")
        )
        .select(
            "token",
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n_test").cast("long").alias("n_test"),
            F.round(term + _EPS, 4).alias("jsd_term"),
        )
        .orderBy(F.desc("jsd_term"), F.asc("token"))
    )


# --- Poisson bootstrap confidence interval ----------------------------------

_BOOT_B = 64
# floor(CDF_Poisson(1)(k) * 2^32) for k = 0..8; a row's multiplicity
# in replicate b is the first k whose threshold exceeds the 32-bit
# md5 draw (capped at 9). Integer literals shared verbatim by both
# engines — the weights are exactly reproducible by construction.
_POIS_T = [
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
    4294962463,
]


def _boot_weight_sql(u: str) -> str:
    branches = "\n             ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 9 END"


@query(
    "poisson_bootstrap_ci",
    f"""
    WITH grp AS (
      SELECT g.g AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             md5(CAST(o_orderkey AS VARCHAR)
                 || ':' || CAST(g.g AS VARCHAR)) AS h
      FROM orders
      CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {_BOOT_B // 4 - 1}))
                  AS g) g
    ),
    expl AS (
      SELECT g * 4 + j.j AS b, cents,
             {_boot_weight_sql(
                 "CAST(concat('0x', substr(h, 1 + 8 * j.j, 8)) AS BIGINT)"
             )} AS w
      FROM grp
      CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS j) j
    ),
    reps AS (
      SELECT b,
             CAST(SUM(CAST(w AS DECIMAL(38,0)) * cents) AS DOUBLE)
             / CAST(SUM(w) AS DOUBLE) / 100.0 AS mean_b
      FROM expl GROUP BY b
      HAVING SUM(w) > 0
    ),
    pt AS (
      SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / COUNT(*) / 100.0 AS mean_pt
      FROM orders
    )
    SELECT CAST((SELECT COUNT(*) FROM reps) AS BIGINT) AS n_replicates,
           ROUND((SELECT mean_pt FROM pt) + 1e-9, 2) AS point_mean,
           ROUND(quantile_cont(mean_b, 0.025) + 1e-9, 2) AS ci_lo,
           ROUND(quantile_cont(mean_b, 0.975) + 1e-9, 2) AS ci_hi
    FROM reps
    """,
    doc="Poisson-bootstrap 95% CI for the mean order price (Chamandy "
    "et al. 2012): each row gets an independent Poisson(1) "
    "multiplicity per replicate from integer md5 thresholds, so all "
    "64 resamples are ONE map-side-combined groupBy — resampling "
    "without resharding, the only bootstrap that works at 100 TB "
    "(the classic bootstrap would shuffle the data B times). One "
    "128-bit md5 feeds FOUR 32-bit replicate draws (16 digests per "
    "row, not 64; with the pre-explode repartition, 8.5→1.8 s at "
    "sf0.1). Replicate means "
    "are exact-integer ratios; the CI is the 2.5/97.5 interpolated "
    "percentile over 64 replicate means.",
)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    # Spark-side plan refinements over the oracle's literal spelling
    # (same integers out, ~3× less work in): (a) the 32-bit draw is
    # compared as the 8-char lowercase HEX SUBSTRING against hex
    # thresholds — zero-padded fixed-width hex orders exactly like
    # the integer it encodes, so no conv() string→int parse per lane;
    # (b) the four lanes of one digest are aggregated as four
    # (sum w, sum w·cents) column pairs in a groupBy(g) over 16 rows
    # per order, and only the 16 GROUP rows expand to 64 replicate
    # rows — the replicate explosion happens after the aggregate, on
    # B/4 rows total, not before it on B×N rows.
    hex_t = [format(t, "08x") for t in _POIS_T]
    # Repartition before the CPU-bound digest fan-out: a single-file
    # orders table is one byte-based split, and the whole 16×N md5
    # pass would run on one core regardless of cluster size (the
    # dedup._doc_shingles precedent — the dominant cost at sf0.1).
    o = o.repartition(
        o.sparkSession.sparkContext.defaultParallelism, "o_orderkey"
    )
    grp = o.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B // 4 - 1))).alias("g"),
        F.col("o_orderkey"),
    ).select(
        "g",
        "cents",
        F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("g").cast("string"),
            )
        ).alias("h"),
    )

    def lane_w(j: int):
        u = F.substring(F.col("h"), 1 + 8 * j, 8)
        w = F.lit(9)
        for k in range(len(hex_t) - 1, -1, -1):
            w = F.when(u < hex_t[k], F.lit(k)).otherwise(w)
        return w

    lanes = grp.select(
        "g",
        "cents",
        *[lane_w(j).alias(f"w{j}") for j in range(4)],
    )
    per_g = lanes.groupBy("g").agg(
        *[
            a
            for j in range(4)
            for a in (
                F.sum(F.col(f"w{j}").cast(_DEC) * F.col("cents")).alias(
                    f"swc{j}"
                ),
                F.sum(f"w{j}").alias(f"sw{j}"),
            )
        ]
    )
    reps = (
        per_g.select(
            "g",
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            F.col(f"swc{j}").alias("swc"),
                            F.col(f"sw{j}").alias("sw"),
                        )
                        for j in range(4)
                    ]
                )
            ).alias("j", "s"),
        )
        .filter(F.col("s.sw") > 0)
        .select(
            (
                F.col("s.swc").cast("double")
                / F.col("s.sw").cast("double")
                / 100.0
            ).alias("mean_b")
        )
    )
    pt = o.agg(
        (
            F.sum("cents").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 100.0
        ).alias("mean_pt")
    )
    return reps.crossJoin(F.broadcast(pt)).agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.round(F.min("mean_pt") + _EPS, 2).alias("point_mean"),
        F.round(
            F.percentile("mean_b", F.lit(0.025)) + _EPS, 2
        ).alias("ci_lo"),
        F.round(
            F.percentile("mean_b", F.lit(0.975)) + _EPS, 2
        ).alias("ci_hi"),
    )


# --- cross-correlation between two daily series ------------------------------


@query(
    "revenue_orders_ccf",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents,
             COUNT(*) AS cnt
      FROM orders GROUP BY o_orderdate
    ),
    lags AS (SELECT UNNEST(GENERATE_SERIES(-3, 3)) AS lag),
    pairs AS (
      SELECT l.lag, a.cents AS x, b.cnt AS y
      FROM daily a
      JOIN lags l ON TRUE
      JOIN daily b ON DATE_DIFF('day', a.day, b.day) = l.lag
    ),
    m AS (
      SELECT lag,
             COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
             SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 + 1e-9, 4) AS ccf
    FROM m ORDER BY lag
    """,
    doc="Cross-correlation between daily revenue and daily order "
    "count at lags -3..+3 — the lead/lag screen (does volume LEAD "
    "revenue, or just accompany it?). Same exact-DECIMAL(38,0) "
    "moment machinery as daily_revenue_acf: one fact-table aggregate "
    "to day grain, then a broadcast lag join over ~2400 day rows; "
    "everything past the first aggregate is negligible at any SF.",
)
def q_revenue_orders_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("cents"),
        F.count(F.lit(1)).alias("cnt"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    pairs = a.join(
        daily.alias("b"),
        F.col("b.day") == F.date_add(F.col("a.day"), F.col("lag")),
    ).select(
        "lag",
        F.col("a.cents").alias("x"),
        F.col("b.cnt").alias("y"),
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(_DEC)).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).alias("sy"),
        F.sum(F.col("x").cast(_DEC) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(_DEC) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(_DEC) * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    r = (nd * F.col("sxy").cast("double") - sxd * syd) / F.sqrt(
        (nd * F.col("sxx").cast("double") - sxd * sxd)
        * (nd * F.col("syy").cast("double") - syd * syd)
    )
    return m.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.round(r + F.lit(1e-9), 4).alias("ccf"),
    ).orderBy("lag")
