"""Skew-handling operators for shuffle joins and hot-key diagnostics.

At 100 TB a handful of hot keys (the one giant customer, the NULL
bucket, the default zip code — cf. the reference's constant
``zip_code=30753`` at `dags/churn_export_dag_cloude.py:333`) can pin
a whole stage on one reducer. The engine's first line of defense is
AQE skew-join splitting (on in session.py), which handles sort-merge
joins automatically. Manual salting remains necessary when:

- the skewed side feeds a *shuffled hash* join or an aggregation AQE
  can't split (non-partial-aggregatable functions),
- the join is big-to-medium where the medium side is too large to
  broadcast but cheap to replicate ``n_salt`` ways,
- deterministic task sizing is required (backfills, bounded SLAs).

Everything here is pure column arithmetic — the salt is a
deterministic ``pmod(xxhash64(...), n)``, never ``rand()``, so plans
stay reproducible and retry-safe (a rand() salt re-deals rows on task
retry, breaking exactly-once sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table

SALT_COL = "__salt"


def hot_keys(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Frequency profile of the heaviest join/group keys: the
    diagnostic run before choosing broadcast / salt / AQE. One
    partial-agg shuffle + TakeOrdered — safe at any scale."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top_n)
    )


def with_salt(df: DataFrame, keys: list[str], n_salt: int) -> DataFrame:
    """Append a deterministic salt in [0, n_salt) derived from the
    WHOLE row's key columns plus a stable row discriminator — spreads
    a hot key uniformly while keeping the mapping reproducible."""
    disc = [F.col(c) for c in df.columns]
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*disc), F.lit(n_salt)))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, replicate the
    other side ``n_salt`` ways (explode of a sequence — no driver
    loop), join on (keys + salt), drop the salt.

    Cost model: the replicated side shuffles n_salt× its size; the
    skewed side's hottest key now lands on n_salt reducers instead of
    one. Use when ``other`` is ≤ ~1/n_salt of the skewed side and too
    big to broadcast; otherwise prefer broadcast() or AQE.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # Replication would duplicate unmatched right-side rows.
        raise ValueError(f"salted_join does not support how={how!r}")
    left = with_salt(skewed, on, n_salt)
    right = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = left.join(right, on + [SALT_COL], how)
    return out.drop(SALT_COL)


def key_skew_report(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Shuffle-skew diagnostic: per ``group_col``, how concentrated
    is the ``key_col`` distribution that a join/groupBy on that key
    would shuffle? Reports the exact-integer concentration moments a
    planner needs to pick broadcast / salt / AQE:

    - ``n_rows`` / ``n_keys`` — fact rows vs distinct reducer keys;
    - ``max_key_rows`` and ``top1_share`` — the single hottest
      reducer's row count and its share of the group (the "one task
      runs forever" number);
    - ``hhi`` — the Herfindahl–Hirschman index Σ(cᵢ/N)² = Σcᵢ²/N²,
      the standard concentration index: 1/n_keys when uniform, →1
      when one key owns the group. ``hhi · n_keys`` > ~4 is the
      practical "salt this join" trigger.

    Scale shape: ONE partial-aggregated (group, key) count shuffle
    (the same reduce the diagnosed join would pay, so if THIS runs,
    the diagnosis is affordable) followed by a group-level fold —
    every moment (Σc, Σc², max c, count) is an exact int64 sum with
    map-side combine, so the report itself never skews: the hot key
    collapses to one row before the second shuffle. Shares are one
    correctly-rounded division per group at the end.
    """
    per_key = df.groupBy(group_col, key_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.sum("c")
    # hhi moments in DECIMAL(38): the oracle's SUM is HUGEINT-exact,
    # and int64 Σc² / n² silently wrap past ~3e9 rows per group —
    # exactly the 100 TB regime this diagnostic targets (the
    # segment_gini_spend DECIMAL precedent). One CR cast of each
    # exact side, then the single CR division, as before.
    cd = F.col("c").cast("decimal(19,0)")
    nd = F.sum(cd)
    return (
        per_key.groupBy(group_col)
        .agg(
            n.cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_key_rows"),
            F.round(
                F.max("c").cast("double") / n.cast("double") + F.lit(1e-9),
                6,
            ).alias("top1_share"),
            F.round(
                F.sum(cd * cd).cast("double")
                / (nd * nd).cast("double")
                + F.lit(1e-9),
                6,
            ).alias("hhi"),
        )
        .orderBy(group_col)
    )


@query(
    "events_key_skew_report",
    """
    WITH per_key AS (
      SELECT event_type, user_id, COUNT(*) AS c
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(SUM(c) AS BIGINT)   AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT)   AS max_key_rows,
           ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                 + 1e-9, 6) AS top1_share,
           ROUND(CAST(SUM(c * c) AS DOUBLE)
                 / CAST(SUM(c) * SUM(c) AS DOUBLE) + 1e-9, 6) AS hhi
    FROM per_key GROUP BY event_type ORDER BY event_type
    """,
    doc="Hot-key shuffle-skew diagnostic over the events stream: per "
    "event_type, the user_id reducer-key concentration a join or "
    "sessionize on user_id would shuffle — n_rows/n_keys, the "
    "hottest key's row count and share, and the exact Herfindahl "
    "index Σcᵢ²/N² (1/n_keys uniform → 1 monopolized). This is the "
    "measurement half of the salting family (`with_salt`/"
    "`salted_join` act on what it finds); all moments are exact "
    "int64 sums with map-side combine, so the diagnostic itself "
    "cannot skew — the hot key is one row after the first reduce.",
)
def q_events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return key_skew_report(ev, "event_type", "user_id")
