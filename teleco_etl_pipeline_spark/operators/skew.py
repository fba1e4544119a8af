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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
