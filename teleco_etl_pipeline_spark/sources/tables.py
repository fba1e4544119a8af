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
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read
        # natively; read it as an int64 nanosecond epoch instead. The
        # conf is session-level and runtime-settable, so this works on
        # any caller-provided SparkSession (incl. the driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
