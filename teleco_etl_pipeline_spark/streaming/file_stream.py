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
