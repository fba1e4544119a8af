"""Parquet table loading for the harness star schema.

The driver supplies deterministic TPC-H-ish parquet tables (see
TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. Loading is a plain
``spark.read.parquet`` — no schema inference cost (parquet carries
its schema), full predicate-pushdown / column-pruning support.

Scale note: at 100 TB these reads become multi-thousand-file scans;
``spark.sql.files.maxPartitionBytes`` (set in session.py) controls
split granularity and filters/projections are pushed to the parquet
reader by Catalyst — keep all downstream code declarative so that
keeps working.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_event_time(df)
    return df


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Guarantee ``events.ts`` is TIMESTAMP_NTZ regardless of datagen
    vintage.

    Current harness data ships ``ts`` as parquet timestamp[us] (no
    tz), which Spark reads natively as TIMESTAMP_NTZ — the fast path
    is a no-op, so range filters on ``ts`` still reach the parquet
    reader as PushedFilters. Older generators wrote timestamp[ns],
    which Spark can only surface as an int64 nanosecond epoch
    (``nanosAsLong``); that legacy shape is converted here (us
    truncation, UTC wall clock) so every downstream plan sees one
    type. TIMESTAMP (LTZ) inputs are re-labelled NTZ — a same-instant
    cast under the engine's UTC session (session.py).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dt = df.schema["ts"].dataType
    if isinstance(dt, TimestampNTZType):
        return df
    if isinstance(dt, LongType):  # legacy int64 epoch-nanos
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    if isinstance(dt, TimestampType):
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    raise TypeError(f"events.ts has unsupported type {dt}")


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every harness table and register it as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
