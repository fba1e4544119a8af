"""Deterministic sampling, splitting, and data-mixing operators for
training-data pipelines (SURVEY.md §7.5 beyond-reference scope).

A 100 TB corpus pipeline needs *reproducible* sampling: train/test
splits that never leak when the job re-runs, per-source stratified
sampling, and source rebalancing ("data mixing") with fixed target
proportions. Spark's ``DataFrame.sample`` is seed-stable only within
one partitioning of one dataset, so these operators derive membership
from a content hash of a key column instead:

    bucket(key) = int(md5(key || salt)[:8 hex], 16) % buckets

Properties that matter at scale:

- **Pure map-side**: split/sample are a projection + filter — no
  shuffle, no driver round-trip, safe under repartitioning, and rows
  keep their assignment when the corpus is re-sharded or appended to.
- **Cross-engine reproducible**: md5 is standardized, so the exact
  same membership can be recomputed by any other engine (the DuckDB
  oracles here do exactly that) or by a downstream consumer
  validating the split.
- **Salt** separates independent decisions (the mix hash must not
  correlate with the split hash, or the "test" slice would be
  systematically over/under-mixed).

``balanced_mix`` additionally needs per-source row counts: one tiny
aggregate (|sources| rows), a window over that aggregate, and a
broadcast join back — the 100 TB fact table is scanned once and never
shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table

#: Bucket granularity — 1e6 gives 0.0001% rate resolution, enough to
#: express any realistic mixing weight while keeping the modulus well
#: inside the 32-bit hash prefix's range (no bias: 2^32 % 1e6 skews
#: bucket probabilities by < 0.024%, and identically in both engines).
BUCKETS = 1_000_000


def hash_bucket(key: Column | str, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from md5(key || salt).

    The 8-hex-char (32-bit) prefix is parsed base-16 JVM-side via
    ``conv``; DuckDB mirrors it as ``CAST(concat('0x', substr(md5(k),
    1, 8)) AS BIGINT)``.
    """
    c = F.col(key) if isinstance(key, str) else key
    keyed = c.cast("string")
    if salt:
        keyed = F.concat(keyed, F.lit(salt))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("bigint") % buckets
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Assign every row a stable ``split`` label with the given
    fractions (e.g. ``{"train": .8, "valid": .1, "test": .1}``).

    Fractions are cumulated onto the bucket range, so a row's label
    is a pure function of its key — appending data or re-running the
    job never moves a row across splits (the property that prevents
    test-set leakage in incremental corpus builds).
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    b = hash_bucket(key_col, salt=salt)
    expr: Column | None = None
    cum = 0.0
    items = list(splits.items())
    for name, frac in items[:-1]:
        cum += frac
        thr = int(cum * BUCKETS)
        expr = (
            F.when(b < thr, F.lit(name))
            if expr is None
            else expr.when(b < thr, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows (uniform across any
    stratum, since the hash is independent of every other column).
    Map-side filter only — no shuffle, no state."""
    thr = int(fraction * BUCKETS)
    return df.filter(hash_bucket(key_col, salt=salt) < thr)


def balanced_mix(
    df: DataFrame, key_col: str, source_col: str, salt: str = "mix"
) -> DataFrame:
    """Rebalance a multi-source corpus so every source contributes
    ~equally: each source is down-sampled at rate min_count/count.

    Plan shape (scale-critical): per-source counts are one partial-agg
    shuffle producing |sources| rows; the min is a window over that
    tiny aggregate (single-partition window over ~dozens of rows, NOT
    over the fact table); rates broadcast-join back onto the corpus.
    The corpus itself is scanned once, filtered map-side.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    rates = counts.select(
        F.col(source_col),
        (
            F.min("__n").over(Window.partitionBy()).cast("double")
            / F.col("__n")
            * BUCKETS
        )
        .cast("bigint")
        .alias("__thr"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_bucket(key_col, salt=salt) < F.col("__thr"))
        .drop("__thr")
    )


# DuckDB equivalent of hash_bucket for the oracles below.
_DUCK_BUCKET = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR){salt}), 1, 8)) "
    "AS BIGINT) % 1000000"
)


@query(
    "doc_split_assign",
    f"""
    SELECT doc_id,
           CASE WHEN {_DUCK_BUCKET.format(salt="")} < 800000 THEN 'train'
                WHEN {_DUCK_BUCKET.format(salt="")} < 900000 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic 80/10/10 train/valid/test split: md5-bucket "
    "membership, pure map-side, append-stable (no test-set leakage "
    "on corpus growth). Cross-engine reproducible by construction — "
    "the oracle recomputes the identical assignment in DuckDB.",
)
def q_doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )


@query(
    "doc_stratified_sample",
    f"""
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE {_DUCK_BUCKET.format(salt=" || 'samp'")} < 300000
    GROUP BY source
    """,
    doc="Deterministic 30% sample with per-source accounting: the "
    "hash-threshold filter runs map-side before the single count "
    "shuffle; the 'samp' salt decorrelates it from the split hash.",
)
def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return (
        stratified_sample(docs, "doc_id", 0.3, salt="samp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@query(
    "doc_balanced_mix",
    f"""
    WITH c AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), r AS (
      SELECT source,
             CAST(CAST(MIN(n) OVER () AS DOUBLE) / n * 1000000 AS BIGINT) AS thr
      FROM c
    )
    SELECT d.source, COUNT(*) AS n_kept
    FROM documents d JOIN r ON d.source = r.source
    WHERE {_DUCK_BUCKET.format(salt=" || 'mix'")} < r.thr
    GROUP BY d.source
    """,
    doc="Source-balanced data mixing: down-sample every source to "
    "~the smallest source's volume. Counts aggregate is tiny "
    "(|sources| rows), min is a window over THAT (never the fact "
    "table), rates broadcast back — corpus scanned once, no fact "
    "shuffle before the final count.",
)
def q_doc_balanced_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        balanced_mix(docs, "doc_id", "source", salt="mix")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


def pack_context_windows(
    docs: DataFrame,
    budget_tokens: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """GPT-style sequence packing: concatenate each shard's documents
    (in stable id order) into one token stream and cut it every
    ``budget_tokens`` — each document is assigned the window holding
    its first token (documents may straddle a cut; the trainer's
    loader handles the carry, exactly as concat-and-split pretraining
    pipelines do).

    Scale shape: the shard id is the md5 bucket of the document key,
    so the one shuffle this needs — the running token sum — hash-
    partitions uniformly regardless of corpus skew, and each shard
    packs independently (embarrassingly parallel across shards; pick
    ``n_shards`` ≈ a few × cluster cores). The running sum is the only
    sequential dependency and it is bounded per shard, never global.
    Assignment is a pure function of (key, text) — append-stable and
    cross-engine reproducible like every operator in this module.
    """
    from teleco_etl_pipeline_spark.operators.text import tokens

    d = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("n_tokens"),
        hash_bucket(id_col, salt=salt, buckets=n_shards).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(start / budget_tokens).alias("window_id"),
        (start % budget_tokens).alias("offset_in_window"),
    )


@query(
    "doc_pack_windows",
    r"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'pack'), 1, 8))
                  AS BIGINT) % 8 AS shard
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  AS BIGINT) - n_tokens AS start_tok
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           start_tok // 256 AS window_id,
           start_tok % 256 AS offset_in_window
    FROM c
    """,
    doc="Sequence packing for pretraining: per-shard concatenate-and-"
    "cut into 256-token windows; md5-sharded so the single running-"
    "sum shuffle is uniform and shards pack independently at any "
    "corpus size.",
)
def q_doc_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_context_windows(docs, budget_tokens=256, n_shards=8)


@query(
    "train_test_contamination",
    f"""
    WITH f AS (
      SELECT doc_id,
             md5(array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:8], ' ')) AS fp,
             CASE WHEN {_DUCK_BUCKET.format(salt="")} < 800000 THEN 'train'
                  WHEN {_DUCK_BUCKET.format(salt="")} < 900000 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT t.fp AS fp, t.doc_id AS train_doc_id, e.doc_id AS test_doc_id
    FROM f t JOIN f e ON t.fp = e.fp
    WHERE t.split = 'train' AND e.split = 'test'
    """,
    doc="Train/test decontamination: flag training documents whose "
    "loose fingerprint (md5 of the first 8 tokens — catches templated "
    "near-copies exact hashing misses) collides with a held-out test "
    "document. The join key is a 16-byte hash, never text, so the "
    "shuffle is minimal; in production the fingerprint table is "
    "materialized once (bronze pattern) rather than recomputed per "
    "check, and the held-out side is usually small enough to "
    "broadcast.",
)
def q_train_test_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from teleco_etl_pipeline_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.array_join(F.slice(tokens("text"), 1, 8), " ")).alias("fp"),
    )
    d = deterministic_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    train = d.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), "fp"
    )
    test = d.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc_id"), "fp"
    )
    return train.join(test, "fp").select("fp", "train_doc_id", "test_doc_id")


def weighted_sample_without_replacement(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wswr",
) -> DataFrame:
    """Exactly-``n`` weighted sample WITHOUT replacement, deterministic
    and single-pass: Efraimidis–Spirakis keys key_i = u_i^(1/w_i) with
    u_i a uniform derived from md5(id || salt), take the n largest.
    Inclusion probability is proportional-to-weight at each of the n
    sequential draws — the quality-weighted corpus-mixing primitive
    ("sample 10M docs, favoring high quality, reproducibly").

    Scale shape: one projection + TakeOrderedAndProject — every
    partition keeps its local top-n and the driver merges; no
    shuffle of the corpus, no RNG state (engine-independent md5
    uniforms, the same trick as deterministic_split).

    Known accepted fragility (the LSH-sign argument): pow/division
    FP between engines could reorder two keys within ~1 ulp; with
    continuous uniforms a tie at the n-th order statistic is
    astronomically unlikely.
    """
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    key = F.pow(u, 1.0 / w)
    return (
        df.withColumn("es_key", F.round(key + F.lit(1e-9), 6))
        .orderBy(F.desc("es_key"), F.asc(id_col))
        .limit(n)
        .select(id_col, weight_col, "es_key")
    )


@query(
    "doc_weighted_sample",
    r"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ROUND(pow(
               CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 'wswr')), 1, 15)) AS BIGINT)
                 / 1152921504606846976.0,
               1.0 / greatest(CAST(n_chars AS DOUBLE), 1.0)) + 1e-9, 6) AS es_key
      FROM documents
    )
    SELECT doc_id, n_chars, es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id ASC
    LIMIT 25
    """,
    doc="Deterministic weighted sampling without replacement "
    "(Efraimidis-Spirakis keys from md5 uniforms, weight = doc "
    "length): top-25 by key via TakeOrderedAndProject — no corpus "
    "shuffle, no RNG state, engine-reproducible.",
)
def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample_without_replacement(
        load_table(spark, sf_dir, "documents"), n=25, weight_col="n_chars"
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled multinomial source mixing (the multilingual-
    pretraining rebalance of XLM-R / mT5, public): sample group g at a
    rate ∝ n_g^(α-1) so the effective mixture follows p_g^α — α=1 is
    the natural distribution, α→0 approaches uniform, and intermediate
    α up-weights tails without the hard equal-quota cliff of
    :func:`balanced_mix` (which is the α=0 endpoint with a cap).

    Rates are normalized so the SMALLEST group keeps 100% (pure
    down-sampling — deterministic, no replication): keep_rate_g =
    (n_min / n_g)^(1-α), rounded to 4 dp with the catalog EPS nudge so
    the threshold is cross-engine identical; membership compares the
    row's md5 bucket FRACTION against that rounded rate (never a
    float-truncated integer threshold, whose trunc-vs-round cast
    semantics differ between engines).

    Plan shape = :func:`balanced_mix`: per-group counts are a tiny
    aggregate, the min is a window over THAT, rates broadcast back,
    and the corpus is filtered map-side in a single scan.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    rates = counts.select(
        F.col(group_col),
        F.round(
            F.pow(
                F.min("__n").over(Window.partitionBy()).cast("double")
                / F.col("__n"),
                F.lit(1.0 - alpha),
            )
            + 1e-9,
            4,
        ).alias("keep_rate"),
    )
    frac = hash_bucket(key_col, salt=salt) / F.lit(float(BUCKETS))
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(frac < F.col("keep_rate"))
    )


@query(
    "doc_temperature_mix",
    f"""
    WITH c AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), r AS (
      SELECT lang,
             ROUND(POW(CAST(MIN(n) OVER () AS DOUBLE) / n, 0.5) + 1e-9, 4)
               AS keep_rate
      FROM c
    )
    SELECT d.lang, ANY_VALUE(r.keep_rate) AS keep_rate, COUNT(*) AS n_kept
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE ({_DUCK_BUCKET.format(salt=" || 'temp'")}) / 1000000.0 < r.keep_rate
    GROUP BY d.lang
    """,
    doc="Temperature-scaled language mixing (α=0.5): keep rate "
    "(n_min/n_lang)^0.5 flattens the language distribution halfway "
    "to uniform — head languages down-sampled, tail kept whole. "
    "Rounded-rate fraction compare keeps the threshold cross-engine "
    "exact; one corpus scan, map-side filter.",
)
def q_doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        temperature_mix(docs, "doc_id", "lang", alpha=0.5, salt="temp")
        .groupBy("lang")
        .agg(
            F.any_value("keep_rate").alias("keep_rate"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )


@query(
    "contamination_ngram_overlap",
    f"""
    WITH labeled AS (
      SELECT doc_id, text,
             CASE WHEN {_DUCK_BUCKET.format(salt="")} < 800000 THEN 'train'
                  WHEN {_DUCK_BUCKET.format(salt="")} < 900000 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    ), tok AS (
      SELECT doc_id, split, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM labeled WHERE split IN ('train', 'test')
    ), sh AS (
      SELECT doc_id, split,
             unnest(list_distinct([array_to_string(toks[i:i+4], ' ')
                     for i in generate_series(1, len(toks) - 4)])) AS shingle
      FROM tok WHERE len(toks) >= 5
    ), train_set AS (
      SELECT DISTINCT shingle FROM sh WHERE split = 'train'
    ), marked AS (
      SELECT s.doc_id, s.shingle, t.shingle IS NOT NULL AS hit
      FROM (SELECT * FROM sh WHERE split = 'test') s
      LEFT JOIN train_set t ON s.shingle = t.shingle
    )
    SELECT doc_id AS test_doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           ROUND(CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) + 1e-9, 4) AS overlap_frac,
           ROUND(CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) + 1e-9, 4) >= 0.2 AS contaminated
    FROM marked GROUP BY doc_id
    """,
    doc="N-gram-overlap decontamination (the GPT-3/PaLM-report "
    "method): a held-out document is contaminated when too many of "
    "its 5-gram shingles appear ANYWHERE in the training split — "
    "catching partial/remixed copies that the exact-fingerprint "
    "check (train_test_contamination) misses. Linear, not "
    "quadratic: one distinct over train shingles, one hash join "
    "from test shingles (the small side), one per-doc agg. At "
    "100 TB the train shingle set is materialized once, bucketed "
    "by shingle (or replaced by a bloom filter for approximate "
    "marking); the flag compares on the ROUNDED fraction so "
    "membership is cross-engine exact.",
)
def q_contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from teleco_etl_pipeline_spark.operators.dedup import _doc_shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    labeled = deterministic_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    # split is a pure function of doc_id (hash bucket), so it's
    # recomputed on the exploded shingles instead of joined back —
    # a per-row md5 beats shuffling (doc, shingle) against the corpus.
    # cache: the tokenize+explode leaf feeds BOTH the train distinct
    # and the test probe side — uncached it runs twice (measured
    # 3.6 s at sf0.1, ~2× the cached cost; same reasoning as the
    # jaccard self-join's shingle cache, dedup.py).
    sh = deterministic_split(
        _doc_shingles(labeled.filter(F.col("split").isin("train", "test")), n=5),
        "doc_id",
        {"train": 0.8, "valid": 0.1, "test": 0.1},
    ).cache()
    train_set = (
        sh.filter(F.col("split") == "train").select("shingle").distinct()
    )
    test_sh = sh.filter(F.col("split") == "test")
    marked = test_sh.join(
        train_set.withColumn("__hit", F.lit(1)), "shingle", "left"
    )
    frac = F.round(
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("double")
        / F.count(F.lit(1))
        + F.lit(1e-9),
        4,
    )
    return marked.groupBy(F.col("doc_id").alias("test_doc_id")).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        frac.alias("overlap_frac"),
        (frac >= 0.2).alias("contaminated"),
    )


def token_budget_mix(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Cap every group at an exact TOKEN budget (not a doc count):
    order each group's docs by the deterministic md5 bucket (so the
    kept set is engine- and run-reproducible and append-stable in
    expectation), take the running token sum, and admit a doc iff the
    budget was not yet exhausted when it starts (``cum - own < B`` —
    so the boundary doc that crosses the budget is still admitted,
    matching how training-data mixes overshoot rather than truncate
    documents mid-text). One window shuffle on the group key; token
    counting is the house whitespace convention (split(trim, '\\s+'),
    JVM-side).

    Returns the ADMITTED ROWS with every caller column intact plus
    the internal ``__toks`` / ``__cum`` accounting columns — callers
    mixing a real corpus need the admitted-doc set itself, not just
    its aggregate (ADVICE r5)."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_bucket(id_col, salt=salt), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        docs["*"],
        toks.alias("__toks"),
        F.sum(toks).over(w).alias("__cum"),
    )
    return with_cum.filter(F.col("__cum") - F.col("__toks") < budget)


_BUDGET = 2000


@query(
    "doc_token_budget_mix",
    f"""
    WITH t AS (
      SELECT source,
             len(regexp_split_to_array(trim(text), '\\s+')) AS toks,
             {_DUCK_BUCKET.format(salt=" || 'budget'")} AS b,
             doc_id
      FROM documents
    ), c AS (
      SELECT source, toks,
             SUM(toks) OVER (PARTITION BY source ORDER BY b, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens
    FROM c
    WHERE cum - toks < {_BUDGET}
    GROUP BY source ORDER BY source
    """,
    doc="Token-budget dataset mixing: admit each source's docs in "
    "deterministic md5 order until an exact per-source TOKEN budget "
    "is spent (the boundary doc is admitted whole) — how production "
    "mixes hit a token recipe rather than a doc-count one. Window "
    "cumsum per source, one shuffle; see token_budget_mix.",
)
def q_doc_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    kept = token_budget_mix(docs, _BUDGET)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__toks").alias("n_tokens"),
        )
        .orderBy("source")
    )
