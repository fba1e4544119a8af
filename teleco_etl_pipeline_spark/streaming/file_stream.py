"""File-arrival streaming source (St2) + foreachBatch merge (St3).

The reference polls a fixed_data/ directory with an Airflow sensor
(poke 60 s, Reprocessing.py:160-185). The Spark-native equivalent is
a Structured Streaming file source: each discovered file becomes a
micro-batch, processed exactly once (checkpointed file index), with
``trigger(availableNow=True)`` for the batch-drain mode the sensor
loop approximates and processingTime triggers for continuous watch.

``foreach_batch_upsert`` wires the stream into the same
delete-then-insert merge (M3) the batch reprocess loop uses — one
code path for late/corrected data in both modes.

Event-time windowed aggregation with watermarking is included as the
general late-data pattern (the reference has no event-time windows,
but any streaming deployment of this engine needs them; see
watermarked_counts).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def file_arrival_stream(
    spark: SparkSession,
    watch_dir: str,
    schema: T.StructType,
    fmt: str = "csv",
) -> DataFrame:
    """St2: stream of rows from files arriving in watch_dir."""
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 16)
    )
    if fmt == "csv":
        reader = reader.option("header", True)
    return reader.load(watch_dir).withColumn(
        "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def foreach_batch_upsert(
    stream: DataFrame,
    checkpoint_dir: str,
    merge_fn: Callable[[DataFrame, int], None],
    available_now: bool = True,
    processing_time: str = "60 seconds",
) -> StreamingQuery:
    """St3: drive each micro-batch of corrected rows through a merge
    callback (typically plans.reprocess-style delete-then-insert).

    availableNow=True drains everything currently in the directory
    then stops — the batch-parity mode used in tests and backfills;
    otherwise a processingTime trigger keeps watching (sensor parity).
    """
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_fn)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def watermarked_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "10 minutes",
    late_threshold: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with a lateness watermark —
    the general late-data aggregation pattern. State for windows
    older than the watermark is dropped, bounding memory at any
    scale."""
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(F.window(F.col(ts_col), window_len), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "cnt",
        )
    )


def foreach_batch_scd2(
    stream: DataFrame,
    checkpoint_dir: str,
    dim_path: str,
    key_cols: list[str],
    ts_us_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
    available_now: bool = True,
    processing_time: str = "60 seconds",
) -> StreamingQuery:
    """CDC stream → SCD2 dimension history: every micro-batch of
    change rows merges into the Parquet dimension table through
    ``operators.scd.scd2_apply`` — history-preserving streaming
    upserts, the streaming twin of the batch M1 merge.

    The checkpoint makes micro-batches exactly-once, scd2_apply
    touches only the keys present in the batch, and the table swap is
    the crash-safe ``safe_overwrite`` (at real scale: a Delta/Iceberg
    MERGE instead of the whole-table Parquet swap, same plan shape
    per batch). Batch-order caveat: foreachBatch delivers batches in
    arrival order, so the extract-side watermark contract (changes
    not older than a key's current version) carries over unchanged.
    """
    import os

    from teleco_etl_pipeline_spark.operators.scd import (
        scd2_apply,
        scd2_from_changes,
    )
    from teleco_etl_pipeline_spark.operators.upsert import (
        heal_interrupted_swap,
        safe_overwrite,
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # The swap contract (upsert.heal_interrupted_swap): a crash
        # between safe_overwrite's two renames leaves only the .old
        # backup, and an unguarded exists() check would rebuild the
        # dimension from THIS batch alone — discarding all history.
        heal_interrupted_swap(dim_path)
        if os.path.exists(dim_path):
            dim = spark.read.parquet(dim_path)
            new_dim = scd2_apply(
                dim, batch_df, key_cols, ts_us_col, attr_cols, tiebreak_col
            )
        else:
            new_dim = scd2_from_changes(
                batch_df, key_cols, ts_us_col, attr_cols, tiebreak_col
            )
        safe_overwrite(new_dim, dim_path)

    return foreach_batch_upsert(
        stream,
        checkpoint_dir,
        merge,
        available_now=available_now,
        processing_time=processing_time,
    )
