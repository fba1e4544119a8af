"""BPE merge-table induction — the actual training loop, unrolled.

`text.py:q_bpe_pair_counts` computes step 1 (corpus-weighted adjacent
pair counts). This module runs the full recurrence for a fixed merge
budget: per round, pick the argmax pair (count DESC, pair ASC
tie-break) and APPLY the merge to every word's symbol sequence, so
round k+1 counts pairs over the post-merge vocabulary — i.e. real
Sennrich et al. (ACL'16) BPE learning, not a one-shot ranking.

Like all BPE trainers, the loop runs over the DISTINCT vocabulary
(word → corpus frequency), not the token stream: a trillion-token
corpus becomes a million-row vocab before any per-character work.
Each round is two small shuffles (pair aggregate + argmax) over that
vocab — at 100 TB the vocab table is megabytes, so the unrolled plan
is dominated by the single initial token-count pass.

The merge APPLICATION is the interesting operator bit: a symbol
sequence is encoded as a delimited string ``||s1||s2||…||``, and
merging pair (x, y) is ONE literal (non-regex) string replace of
``|x||y|`` with ``|xy|``. Both engines' `replace` scans leftmost,
non-overlapping, resuming after the replaced span — and because the
pattern consumes only the INNER of each double delimiter, a run
``a a a a`` merges to ``[aa][aa]`` exactly like the textbook greedy
left-to-right pass (verified in tests against a pure-Python BPE).
No UDF, no lateral recursion: merge-apply stays in whole-stage
codegen as a string kernel. Words containing the delimiter char are
excluded up front (contract, not silent corruption).

The per-round argmax enters the plan as a scalar subquery (the
`doc_length_band_filter` precedent), so the whole K-merge recurrence
is ONE declarative plan — no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table

_N_MERGES = 3
_TOP_TOKENS = 10


def _duck_sql(k: int, topk: int) -> str:
    ctes = []
    prev = "e0"
    for i in range(1, k + 1):
        ctes.append(
            f"""
    p{i} AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS c FROM (
        SELECT unnest(['|'||s[j]||'||'||s[j+1]||'|'
                       for j in generate_series(1, len(s)-1)]) AS pair, freq
        FROM (SELECT string_split(trim(enc,'|'),'||') AS s, freq FROM {prev}) t{i}
        WHERE len(s) >= 2
      ) pp{i} GROUP BY pair
    ),
    m{i} AS (SELECT pair, c FROM p{i} ORDER BY c DESC, pair LIMIT 1),
    e{i} AS (
      SELECT w, replace(enc, (SELECT pair FROM m{i}),
                     '|'||replace((SELECT pair FROM m{i}),'|','')||'|') AS enc, freq
      FROM {prev}
    )"""
        )
        prev = f"e{i}"
    merges = "\n    UNION ALL ".join(
        f"SELECT 'merge' AS kind, CAST({i} AS BIGINT) AS rank, "
        f"replace(pair,'|','') AS item, c AS weight FROM m{i}"
        for i in range(1, k + 1)
    )
    return f"""
    WITH wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents
      ) ww WHERE length(w) >= 1 AND w NOT LIKE '%|%' GROUP BY w
    ),
    e0 AS (
      SELECT w, '|' || regexp_replace(w, '(.)', '\\1||', 'g') || '|' AS enc, freq
      FROM wf
    ),{",".join(ctes)},
    vocab AS (
      SELECT tok, CAST(SUM(freq) AS BIGINT) AS c FROM (
        SELECT unnest(string_split(trim(enc,'|'),'||')) AS tok, freq FROM {prev}
      ) v GROUP BY tok
    ),
    topv AS (
      SELECT 'token' AS kind,
             CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rank,
             tok AS item, c AS weight
      FROM vocab ORDER BY c DESC, tok LIMIT {topk}
    )
    {merges}
    UNION ALL SELECT * FROM topv
    ORDER BY kind, rank
    """


def _spark_sql(k: int, topk: int) -> str:
    """Structural twin of ``_duck_sql`` in Spark SQL: unnest→explode,
    list comprehension→transform(sequence), string_split→split with
    an escaped regex, trim(x,'|')→trim(BOTH '|' FROM x)."""
    ctes = []
    prev = "e0"
    for i in range(1, k + 1):
        ctes.append(
            f"""
    p{i} AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS c FROM (
        SELECT explode(transform(sequence(1, size(s)-1),
                 j -> '|'||element_at(s,j)||'||'||element_at(s,j+1)||'|')) AS pair,
               freq
        FROM (SELECT split(trim(BOTH '|' FROM enc), '\\\\|\\\\|') AS s, freq
              FROM {prev}) t{i}
        WHERE size(s) >= 2
      ) pp{i} GROUP BY pair
    ),
    m{i} AS (SELECT pair, c FROM p{i} ORDER BY c DESC, pair LIMIT 1),
    e{i} AS (
      SELECT w, replace(enc, (SELECT pair FROM m{i}),
                     '|'||replace((SELECT pair FROM m{i}),'|','')||'|') AS enc, freq
      FROM {prev}
    )"""
        )
        prev = f"e{i}"
    merges = "\n    UNION ALL ".join(
        f"SELECT 'merge' AS kind, CAST({i} AS BIGINT) AS rank, "
        f"replace(pair,'|','') AS item, c AS weight FROM m{i}"
        for i in range(1, k + 1)
    )
    return f"""
    WITH wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT explode(split(trim(text), '\\\\s+')) AS w FROM {{documents}}
      ) ww WHERE length(w) >= 1 AND w NOT LIKE '%|%' GROUP BY w
    ),
    e0 AS (
      SELECT w, '|' || regexp_replace(w, '(.)', '$1||') || '|' AS enc, freq
      FROM wf
    ),{",".join(ctes)},
    vocab AS (
      SELECT tok, CAST(SUM(freq) AS BIGINT) AS c FROM (
        SELECT explode(split(trim(BOTH '|' FROM enc), '\\\\|\\\\|')) AS tok, freq
        FROM {prev}
      ) v GROUP BY tok
    ),
    topv AS (
      SELECT 'token' AS kind,
             CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rank,
             tok AS item, c AS weight
      FROM vocab ORDER BY c DESC, tok LIMIT {topk}
    )
    {merges}
    UNION ALL SELECT * FROM topv
    ORDER BY kind, rank
    """


@query(
    "bpe_learn_merges",
    _duck_sql(_N_MERGES, _TOP_TOKENS),
    doc=f"Full BPE training recurrence, {_N_MERGES} merges unrolled "
    "(Sennrich ACL'16): per round, argmax adjacent-pair count over "
    "the CURRENT vocab encoding (count DESC / pair ASC tie-break), "
    "then apply the merge to every word via one literal string "
    "replace on a double-delimited symbol encoding — greedy "
    "left-to-right pairing semantics proven equal to the textbook "
    "algorithm in tests. Runs over word→freq (vocab-sized, megabytes "
    "at 100 TB), argmax as scalar subqueries — one declarative plan, "
    "no driver loop, no UDF. Output: the learned merge table + "
    f"top-{_TOP_TOKENS} post-merge vocabulary tokens.",
)
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("text")
    return spark.sql(_spark_sql(_N_MERGES, _TOP_TOKENS), documents=d)


def _encode_chain(dialect_sql, k: int) -> str:
    """The wf→e0→…→eK merge chain from the learn query (same text,
    `w` carried through), with the learn query's final SELECT
    stripped so an encode finisher can build on e{k}."""
    body = dialect_sql(k, 1)
    # cut everything from the vocab CTE on; keep WITH … e{k}(…)
    cut = body.index(",\n    vocab AS (")
    return body[:cut]


def _encode_finisher_duck(k: int) -> str:
    return f""",
    wordtok AS (
      SELECT w,
             CAST(len(string_split(trim(enc,'|'),'||')) AS BIGINT) AS n_tok,
             CAST(length(w) AS BIGINT) AS n_sym
      FROM e{k}
    ),
    doctok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents
      ) dt WHERE length(w) >= 1 AND w NOT LIKE '%|%'
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(t.n_sym) AS BIGINT) AS n_chars,
           CAST(SUM(t.n_tok) AS BIGINT) AS n_bpe_tokens
    FROM doctok d JOIN wordtok t ON d.w = t.w
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """


def _encode_finisher_spark(k: int) -> str:
    return f""",
    wordtok AS (
      SELECT w,
             CAST(size(split(trim(BOTH '|' FROM enc), '\\\\|\\\\|')) AS BIGINT) AS n_tok,
             CAST(length(w) AS BIGINT) AS n_sym
      FROM e{k}
    ),
    doctok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS w
        FROM {{documents}}
      ) dt WHERE length(w) >= 1 AND w NOT LIKE '%|%'
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(t.n_sym) AS BIGINT) AS n_chars,
           CAST(SUM(t.n_tok) AS BIGINT) AS n_bpe_tokens
    FROM doctok d JOIN wordtok t ON d.w = t.w
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """


@query(
    "bpe_encode_docs",
    _encode_chain(_duck_sql, _N_MERGES) + _encode_finisher_duck(_N_MERGES),
    doc="The trained tokenizer APPLIED: learn the merge table "
    f"in-plan (same {_N_MERGES}-round recurrence as "
    "`bpe_learn_merges`), then encode every document through it — "
    "per-doc word / character-symbol / post-BPE token counts. The "
    "application is a broadcast join of the token stream against the "
    "vocab-sized (word → token count) table, i.e. tokenization cost "
    "at 100 TB is one map-side lookup per word occurrence, all the "
    "per-character work confined to the vocab. n_chars vs "
    "n_bpe_tokens is the compression the merges bought.",
)
def q_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sql = _encode_chain(_spark_sql, _N_MERGES) + _encode_finisher_spark(_N_MERGES)
    return spark.sql(sql, documents=d)
