"""Stream-stream interval join + watermark-bounded streaming dedup,
run as real micro-batch streams (file source, one file per trigger)."""

from __future__ import annotations

from pyspark.sql import types as T


def _csv_stream(spark, path, schema):
    return (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .load(str(path))
    )


def test_interval_join_attributes_clicks(spark, tmp_path):
    from teleco_etl_pipeline_spark.streaming.joins import interval_join

    imp_dir = tmp_path / "imp"
    clk_dir = tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    (imp_dir / "b1.csv").write_text(
        "ad_id,imp_ts\n"
        "1,2026-01-01 00:00:00\n"
        "2,2026-01-01 00:00:00\n"
        "3,2026-01-01 01:00:00\n"
    )
    # ad 1 clicked within 10 min (match), ad 2 clicked 20 min later
    # (outside the interval), ad 3 never clicked, ad 9 clicked with
    # no impression.
    (clk_dir / "b1.csv").write_text(
        "c_ad_id,click_ts\n"
        "1,2026-01-01 00:05:00\n"
        "2,2026-01-01 00:20:00\n"
        "9,2026-01-01 00:05:00\n"
    )
    imp_schema = T.StructType(
        [
            T.StructField("ad_id", T.LongType()),
            T.StructField("imp_ts", T.TimestampType()),
        ]
    )
    clk_schema = T.StructType(
        [
            T.StructField("c_ad_id", T.LongType()),
            T.StructField("click_ts", T.TimestampType()),
        ]
    )
    joined = interval_join(
        _csv_stream(spark, imp_dir, imp_schema),
        _csv_stream(spark, clk_dir, clk_schema),
        key=("ad_id", "c_ad_id"),
        ts=("imp_ts", "click_ts"),
        within="10 minutes",
    )
    emitted: list[int] = []

    def sink(batch_df, _bid):
        emitted.extend(r["ad_id"] for r in batch_df.collect())

    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_j"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert emitted == [1]


def test_dedup_within_watermark_across_batches(spark, tmp_path):
    from teleco_etl_pipeline_spark.streaming.joins import dedup_within_watermark

    ev = tmp_path / "ev"
    ev.mkdir()
    # event 'a' delivered twice in batch 1, again in batch 2 (all
    # within the watermark) → must come out exactly once; 'b' and 'c'
    # are unique.
    (ev / "b1.csv").write_text(
        "event_id,ts\na,2026-01-01 00:00:00\na,2026-01-01 00:00:30\nb,2026-01-01 00:01:00\n"
    )
    (ev / "b2.csv").write_text(
        "event_id,ts\na,2026-01-01 00:02:00\nc,2026-01-01 00:03:00\n"
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    deduped = dedup_within_watermark(
        _csv_stream(spark, ev, schema), keys=["event_id"]
    )
    emitted: list[str] = []

    def sink(batch_df, _bid):
        emitted.extend(r["event_id"] for r in batch_df.collect())

    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_d"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(emitted) == ["a", "b", "c"]


def test_enrich_stream_static_dimension(spark, tmp_path):
    """Stream-static join: per-batch dimension lookup, stateless, and
    the refreshed dimension is visible to later batches."""
    import os
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from teleco_etl_pipeline_spark.streaming.joins import enrich_stream

    src = str(tmp_path / "events_in")
    dim_path = str(tmp_path / "dim")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    os.makedirs(src)

    spark.createDataFrame(
        [(1, "basic"), (2, "premium")], ["plan_id", "plan_name"]
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    schema = StructType(
        [StructField("event_id", LongType()), StructField("plan_id", LongType())]
    )
    stream = spark.readStream.schema(schema).json(src)
    enriched = enrich_stream(stream, dim, on="plan_id")

    with open(os.path.join(src, "b1.json"), "w") as f:
        f.write('{"event_id": 100, "plan_id": 1}\n')
        f.write('{"event_id": 101, "plan_id": 3}\n')  # no dim row → left join null
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["event_id"]: r["plan_name"] for r in spark.read.parquet(out).collect()}
    assert rows == {100: "basic", 101: None}

    # stateless lookup: no stateful operator in the progress metrics
    assert all(
        p.get("stateOperators") in ([], None)
        for p in [q.lastProgress]
        if p is not None
    )
