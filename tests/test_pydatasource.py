"""Custom Python DataSource (keyset-partitioned external extraction):
planning, parallelism, pushdown bounds, and value parity with the
native reader."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.sources.pydatasource import (
    keyset_parquet_source,
    register,
)


@pytest.fixture()
def loaded(spark, sf_dir):
    register(spark)
    path = os.path.join(sf_dir, "events.parquet")
    return path, (
        spark.read.format("keyset_oltp")
        .option("path", path)
        .option("partition_col", "event_id")
        .option("num_partitions", "6")
        .load()
    )


def test_keyset_source_matches_native_read(spark, sf_dir, loaded):
    path, df = loaded
    native = spark.read.parquet(path)
    assert df.count() == native.count()
    a = df.agg(
        F.sum("event_id").alias("s"), F.countDistinct("user_id").alias("u")
    ).collect()
    b = native.agg(
        F.sum("event_id").alias("s"), F.countDistinct("user_id").alias("u")
    ).collect()
    assert a == b


def test_keyset_source_plans_requested_cursors(loaded):
    _, df = loaded
    # each key range = one independent "cursor" = one task
    assert df.rdd.getNumPartitions() == 6


def test_keyset_partition_planning_covers_bounds_disjointly():
    cls = keyset_parquet_source()
    from pyspark.sql.types import LongType, StructField, StructType

    # plan directly against explicit bounds (no file needed)
    schema = StructType([StructField("k", LongType())])
    inst = _mk_reader(cls, schema)
    parts = inst.partitions()
    assert [(p.lo, p.hi) for p in parts] == [
        (0, 25),
        (25, 50),
        (50, 75),
        (75, 100),
    ]
    assert parts[-1].last and not parts[0].last


def _mk_reader(cls, schema):
    src = cls(
        options={
            "path": "unused",
            "partition_col": "k",
            "num_partitions": "4",
            "lower": "0",
            "upper": "99",
        }
    )
    return src.reader(schema)


def test_keyset_source_reads_spark_written_directory(spark, tmp_path):
    """Spark writes tables as directories — schema inference, bounds
    planning (multi-file footer sweep) and reads must all handle
    them."""
    p = str(tmp_path / "oltp_tbl")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").repartition(3).write.parquet(p)
    df = (
        spark.read.format("keyset_oltp")
        .option("path", p)
        .option("partition_col", "k")
        .option("num_partitions", "4")
        .load()
    )
    assert df.count() == 100
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got == {i: 2 * i for i in range(100)}


def test_keyset_stream_tails_appends_exactly_once(spark, tmp_path):
    """The streaming keyset tail: run one availableNow batch, append
    new keys to the backend, run a second batch over the SAME
    checkpoint — each key arrives exactly once and the engine-managed
    offset survives the restart."""
    import pandas as pd

    register(spark)
    backend = tmp_path / "oltp"
    backend.mkdir()
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, ids):
        pd.DataFrame({"k": ids, "v": [f"r{i}" for i in ids]}).to_parquet(
            str(backend / name)
        )

    def run_once():
        q = (
            spark.readStream.format("keyset_oltp")
            .option("path", str(backend))
            .option("partition_col", "k")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("a.parquet", [1, 2, 3])
    run_once()
    write_batch("b.parquet", [4, 5])
    run_once()
    got = sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "r1"), (2, "r2"), (3, "r3"), (4, "r4"), (5, "r5")]

    # a third run with no new keys emits nothing new
    run_once()
    assert spark.read.parquet(out).count() == 5


def test_keyset_stream_detects_late_appends_below_offset(tmp_path):
    """Strictly-increasing-key contract (ADVICE r5): a row appended
    with a key <= the committed offset can never be delivered — the
    reader must COUNT and log it (late_rows_skipped), not lose it
    silently. Driven directly through the reader API so the in-memory
    detector state is observable."""
    import pandas as pd

    backend = tmp_path / "oltp"
    backend.mkdir()

    def write_batch(name, ids):
        pd.DataFrame({"k": ids, "v": [f"r{i}" for i in ids]}).to_parquet(
            str(backend / name)
        )

    write_batch("a.parquet", [1, 2, 3])
    src_cls = keyset_parquet_source()
    src = src_cls({"path": str(backend), "partition_col": "k"})
    reader = src.simpleStreamReader(src.schema())

    rows, off = reader.read(reader.initialOffset())
    assert len(list(rows)) == 3 and off == {"last": 3}
    assert reader.late_rows_skipped == 0

    # In-order append delivers normally, no false positive.
    write_batch("b.parquet", [4, 5])
    rows, off = reader.read(off)
    assert len(list(rows)) == 2 and off == {"last": 5}
    assert reader.late_rows_skipped == 0

    # Out-of-order backfill BELOW the committed offset: skipped by
    # contract, but counted and detectable.
    write_batch("c.parquet", [2, 4])
    rows, off2 = reader.read(off)
    assert list(rows) == [] and off2 == off
    assert reader.late_rows_skipped == 2

    # The detector does not double-count on subsequent batches.
    rows, _ = reader.read(off2)
    assert list(rows) == []
    assert reader.late_rows_skipped == 2
