"""End-to-end LLM corpus curation: the composed pipeline.

The individual catalog entries prove each operator alone; this plan
chains them the way a real training-data build does —

    raw documents
      → quality gates   (word-shape + repetition + corpus-relative
                         length band: doc_wordshape_filter,
                         doc_repetition_stats, doc_length_band_filter)
      → exact dedup     (keep min doc_id per normalized-text md5)
      → near-dup prune  (exact n-gram Jaccard pairs ≥ 0.12 among
                         survivors; greedy keep-smaller-id, the same
                         rule as SemDeDup)
      → split           (deterministic 80/10/10 md5-bucket assignment)

and reports per-stage surviving row counts. Everything is computed as
FLAG COLUMNS over one document spine (no per-stage refiltering jobs):
the final result is a single aggregate pass over the flags plus the
one extra branch the near-dup self-join needs. At 100 TB the
qualitative shape is: two shuffles for repetition stats, one window
shuffle for the fingerprint dedup, the shingle self-join (swap in
MinHash via ``minhash_lsh_pairs`` for the sketch path — same flag
contract), and a map-side split — nothing quadratic outside the
declared-exact near-dup stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs
from teleco_etl_pipeline_spark.operators.sampling import hash_bucket
from teleco_etl_pipeline_spark.operators.text import (
    EPS,
    normalized_text,
    repetition_stats,
    tokens,
)
from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table

_REP_SQL = r"""
      SELECT doc_id, 1 AS kind, unnest(w) AS gram FROM t
      UNION ALL
      SELECT doc_id, 2 AS kind,
             unnest([array_to_string(w[i:i+1], ' ')
                     for i in generate_series(1, len(w) - 1)]) AS gram
      FROM t WHERE len(w) >= 2
      UNION ALL
      SELECT doc_id, 3 AS kind,
             unnest([array_to_string(w[i:i+2], ' ')
                     for i in generate_series(1, len(w) - 2)]) AS gram
      FROM t WHERE len(w) >= 3
"""

_CURATE_ORACLE = (
    r"""
    WITH t AS (
      SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
    ), g AS ("""
    + _REP_SQL
    + r"""
    ), f AS (
      SELECT doc_id, kind, gram, length(gram) AS glen, COUNT(*) AS cnt
      FROM g GROUP BY doc_id, kind, gram
    ), repd AS (
      SELECT doc_id,
        COALESCE(SUM(cnt) FILTER (WHERE kind = 1 AND cnt > 1), 0) AS dup_words,
        SUM(cnt) FILTER (WHERE kind = 1) AS n_words,
        SUM(cnt * glen) FILTER (WHERE kind = 1) AS word_chars,
        COALESCE(MAX(cnt * (glen - 1)) FILTER (WHERE kind = 2 AND cnt > 1), 0) AS top2,
        COALESCE(SUM(cnt * (glen - 2)) FILTER (WHERE kind = 3 AND cnt > 1), 0) AS dup3
      FROM f GROUP BY doc_id
    ), rep AS (
      SELECT doc_id,
             (ROUND(CAST(dup_words AS DOUBLE) / n_words + 1e-9, 4) > 0.9
              OR ROUND(CAST(top2 AS DOUBLE) / word_chars + 1e-9, 4) > 0.2
              OR ROUND(CAST(dup3 AS DOUBLE) / word_chars + 1e-9, 4) > 0.3)
               AS repetition_flag
      FROM repd
    ), q AS (
      SELECT t.doc_id, t.text,
             (len(w) BETWEEN 50 AND 100000
              AND ROUND(CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum')
                             AS DOUBLE) / len(w) + 1e-9, 4) BETWEEN 3 AND 10
              AND ROUND(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                             AS DOUBLE) / len(w) + 1e-9, 4) > 0.8
              AND length(text) BETWEEN
                  (SELECT ROUND(quantile_cont(length(text), 0.05) + 1e-9, 6)
                   FROM documents)
                  AND
                  (SELECT ROUND(quantile_cont(length(text), 0.95) + 1e-9, 6)
                   FROM documents)
              AND NOT rep.repetition_flag) AS q_keep
      FROM t JOIN rep USING (doc_id)
    ), e AS (
      SELECT doc_id, text, q_keep,
             (q_keep AND doc_id = MIN(CASE WHEN q_keep THEN doc_id END)
                OVER (PARTITION BY md5(regexp_replace(lower(trim(text)),
                                                      '\s+', ' ', 'g'))))
               AS e_keep
      FROM q
    ), stok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM e WHERE e_keep
    ), ssh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in generate_series(1, len(toks) - 2)]) AS shingles
      FROM stok WHERE len(toks) >= 3
    ), sex AS (
      SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS set_size FROM ssh
    ), pairs AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             COUNT(*) AS shared,
             ANY_VALUE(a.set_size) AS size_a, ANY_VALUE(b.set_size) AS size_b
      FROM sex a JOIN sex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), removed AS (
      SELECT DISTINCT doc_id_b AS doc_id FROM pairs
      WHERE ROUND(CAST(shared AS DOUBLE) / (size_a + size_b - shared) + 1e-9, 4)
            >= 0.12
    ), flags AS (
      SELECT e.doc_id, e.q_keep, e.e_keep,
             (e.e_keep AND r.doc_id IS NULL) AS nd_keep,
             CASE WHEN CAST(concat('0x', substr(md5(CAST(e.doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 1000000 < 800000 THEN 'train'
                  WHEN CAST(concat('0x', substr(md5(CAST(e.doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 1000000 < 900000 THEN 'valid'
                  ELSE 'test' END AS split
      FROM e LEFT JOIN removed r USING (doc_id)
    )
    SELECT 'raw' AS stage, COUNT(*) AS rows_kept FROM flags
    UNION ALL SELECT 'quality', CAST(SUM(CASE WHEN q_keep THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL SELECT 'exact_dedup', CAST(SUM(CASE WHEN e_keep THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL SELECT 'near_dedup', CAST(SUM(CASE WHEN nd_keep THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL SELECT 'split_train', CAST(SUM(CASE WHEN nd_keep AND split = 'train' THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL SELECT 'split_valid', CAST(SUM(CASE WHEN nd_keep AND split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL SELECT 'split_test', CAST(SUM(CASE WHEN nd_keep AND split = 'test' THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    """
)


def curation_flags(docs: DataFrame) -> DataFrame:
    """One row per document with q_keep / e_keep / nd_keep / split —
    the reusable core of the curation pipeline (write THIS at scale;
    counts are just its cheapest consumer)."""
    w = tokens("text")
    n_words = F.size(w)
    mean_word_len = F.round(
        F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x)).cast(
            "double"
        )
        / n_words
        + EPS,
        4,
    )
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double") / n_words
        + EPS,
        4,
    )
    from teleco_etl_pipeline_spark.operators.quantiles import (
        exact_percentiles,
        half_up,
    )

    # Bounded-memory exact percentiles as driver literals (the r11
    # repo-wide sweep of the single-buffer F.percentile pattern).
    lo_v, hi_v = exact_percentiles(docs, F.length("text"), [0.05, 0.95])
    lo, hi = F.lit(half_up(lo_v + EPS, 6)), F.lit(half_up(hi_v + EPS, 6))
    shape_keep = (
        n_words.between(50, 100000)
        & mean_word_len.between(3, 10)
        & (alpha_frac > 0.8)
        & F.length("text").between(lo, hi)
    )
    # Gate on the stat columns rather than the operator's built-in
    # flag: the default dup-word threshold (0.6, tuned for natural
    # text) flags ~83% of the small-vocabulary synthetic corpus,
    # which would degenerate every downstream stage to zero rows.
    rep = repetition_stats(docs).select(
        "doc_id",
        (
            (F.col("dup_word_frac") > 0.9)
            | (F.col("top_bigram_char_frac") > 0.2)
            | (F.col("dup_trigram_char_frac") > 0.3)
        ).alias("repetition_flag"),
    )
    flagged = (
        docs.select("doc_id", "text", shape_keep.alias("shape_keep"))
        .join(rep, "doc_id")
        .withColumn("q_keep", F.col("shape_keep") & ~F.col("repetition_flag"))
    )
    fp_w = Window.partitionBy(F.md5(normalized_text("text")))
    flagged = flagged.withColumn(
        "e_keep",
        F.col("q_keep")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("q_keep"), F.col("doc_id"))).over(fp_w)
        ),
    )
    # Two consumers — the near-dup branch (via survivors) and the
    # final flag join — would each re-execute the 2-shuffle
    # repetition-stats lineage. Cache the flag spine once (measured
    # best-of-2 2.1 → 0.95 s at sf0.1). LIFETIME: the returned plan is lazy,
    # so the blocks outlive this function; suite runners release them
    # via spark.catalog.clearCache() between queries (bench.py does),
    # and MEMORY_AND_DISK degrades to recompute, never OOM. At 100 TB
    # write the flag spine to a table instead of caching text.
    flagged = flagged.cache()
    survivors = flagged.filter("e_keep").select("doc_id", "text")
    removed = (
        ngram_jaccard_pairs(survivors, n=3, threshold=0.12, max_shingle_freq=None)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
        .withColumn("_removed", F.lit(1))
    )
    b = hash_bucket("doc_id")
    return (
        flagged.join(removed, "doc_id", "left")
        .withColumn("nd_keep", F.col("e_keep") & F.col("_removed").isNull())
        .withColumn(
            "split",
            F.when(b < 800000, "train").when(b < 900000, "valid").otherwise("test"),
        )
        .select("doc_id", "q_keep", "e_keep", "nd_keep", "split")
    )


@query(
    "corpus_curation",
    _CURATE_ORACLE,
    doc="The composed LLM-corpus build: quality gates → exact dedup → "
    "near-dup prune → deterministic split, reporting per-stage "
    "surviving counts from ONE flag pass (see plans/corpus.py).",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    flags = curation_flags(docs)
    nd = F.col("nd_keep")
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("q_keep").cast("int")).alias("n_quality"),
        F.sum(F.col("e_keep").cast("int")).alias("n_exact"),
        F.sum(nd.cast("int")).alias("n_near"),
        F.sum((nd & (F.col("split") == "train")).cast("int")).alias("n_train"),
        F.sum((nd & (F.col("split") == "valid")).cast("int")).alias("n_valid"),
        F.sum((nd & (F.col("split") == "test")).cast("int")).alias("n_test"),
    )
    return agg.select(
        F.expr(
            "stack(7, 'raw', n_raw, 'quality', n_quality, "
            "'exact_dedup', n_exact, 'near_dedup', n_near, "
            "'split_train', n_train, 'split_valid', n_valid, "
            "'split_test', n_test) AS (stage, rows_kept)"
        )
    )
