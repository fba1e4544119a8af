"""ML pipeline, streaming file source, and multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from teleco_etl_pipeline_spark.catalog import Warehouse
from teleco_etl_pipeline_spark.plans import ml
from teleco_etl_pipeline_spark.plans.pipeline import run_warehouse
from tests.conftest import write_ingest_csv


@pytest.fixture()
def gold_wh(tmp_path, spark):
    staging_dir = tmp_path / "landing"
    staging_dir.mkdir()
    write_ingest_csv(str(staging_dir / "churn.csv"))
    run_warehouse(spark, str(tmp_path / "wh"), str(staging_dir), run_date="2026-08-13")
    return Warehouse(spark, str(tmp_path / "wh"))


def test_train_and_infer(gold_wh, tmp_path):
    models_dir = str(tmp_path / "models")
    import os

    os.makedirs(models_dir, exist_ok=True)
    report = ml.train(gold_wh, models_dir, version="2026_08_13")
    assert report["rows"] == 10
    assert report["train_auc"] > 0.5  # separable synthetic labels

    n = ml.run_batch_inference(gold_wh, models_dir, "2026-08-13")
    assert n == 10
    preds = gold_wh.read("gold", "churn_predictions")
    assert preds.filter(F.col("churn_prediction").isin(0, 1)).count() == 10
    probs = [float(r["churn_probability"]) for r in preds.collect()]
    assert all(0.0 <= p <= 1.0 for p in probs)

    # idempotent per-day rerun (M5): no duplicates
    ml.run_batch_inference(gold_wh, models_dir, "2026-08-13")
    assert gold_wh.read("gold", "churn_predictions").count() == 10


def test_latest_model_wins(gold_wh, tmp_path):
    models_dir = str(tmp_path / "models")
    import os

    os.makedirs(models_dir, exist_ok=True)
    ml.train(gold_wh, models_dir, version="2026_01_01")
    ml.train(gold_wh, models_dir, version="2026_06_01")
    assert ml.latest_model_path(models_dir).endswith("churn_model_2026_06_01")


def test_file_arrival_stream(spark, tmp_path):
    from teleco_etl_pipeline_spark.streaming.file_stream import (
        file_arrival_stream,
        foreach_batch_upsert,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    (watch / "a.csv").write_text("id,v\n1,x\n2,y\n")
    (watch / "b.csv").write_text("id,v\n3,z\n")

    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    seen: list[tuple] = []

    def merge(batch_df, batch_id):
        seen.extend((r["id"], r["v"], r["source_file"]) for r in batch_df.collect())

    stream = file_arrival_stream(spark, str(watch), schema)
    q = foreach_batch_upsert(
        stream, str(tmp_path / "ckpt"), merge, available_now=True
    )
    q.awaitTermination(60)
    assert sorted(seen) == [(1, "x", "a.csv"), (2, "y", "a.csv"), (3, "z", "b.csv")]

    # exactly-once: a second drain sees nothing new
    seen.clear()
    q2 = foreach_batch_upsert(
        file_arrival_stream(spark, str(watch), schema),
        str(tmp_path / "ckpt"),
        merge,
        available_now=True,
    )
    q2.awaitTermination(60)
    assert seen == []


def test_streaming_watermarked_counts(spark, tmp_path):
    """Event-time windowed agg with watermark over a rate-like stream
    (batch-mode check of the plan shape on static data)."""
    import datetime as dt

    from teleco_etl_pipeline_spark.streaming.file_stream import watermarked_counts

    events = spark.createDataFrame(
        [
            (dt.datetime(2026, 1, 1, 0, 1), "click"),
            (dt.datetime(2026, 1, 1, 0, 2), "click"),
            (dt.datetime(2026, 1, 1, 0, 15), "view"),
        ],
        ["ts", "event_type"],
    )
    out = {
        (r["window_start"].minute, r["event_type"]): r["cnt"]
        for r in watermarked_counts(events).collect()
    }
    assert out == {(0, "click"): 2, (10, "view"): 1}


def test_multimodal_plumbing(spark):
    from teleco_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_batch,
        extract_binary_features,
        frame_sample_plan,
    )

    rows = [
        (1, b"\x89PNG\r\n" + b"x" * 100, "image/png", (64, 64, None)),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 50, "image/jpeg", (32, 32, None)),
        (3, b"RIFF" + b"z" * 200, "audio/wav", (None, None, 3500)),
        (4, None, None, (None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in extract_binary_features(media).collect()}
    assert feats[1]["sniffed_type"] == "image/png"
    assert feats[2]["sniffed_type"] == "image/jpeg"
    assert feats[3]["sniffed_type"] == "audio/wav"
    assert feats[4]["n_bytes"] == 0
    assert feats[1]["n_bytes"] == 106

    # real decode path (r9): non-PNG / truncated payloads yield NULL
    # feature columns instead of raising
    real = {r["media_id"]: r for r in decode_image_batch(media).collect()}
    assert all(real[i]["width"] is None for i in (1, 2, 3, 4))
    decoded = {r["media_id"]: r for r in decode_image_batch(media, fake=True).collect()}
    assert 16 <= decoded[1]["width"] < 80

    frames = frame_sample_plan(media.filter(F.col("media_id") == 3), every_ms=1000)
    assert frames.count() == 4  # 0,1000,2000,3000 for 3500ms


def _encode_png(pixels, nch, filters=None):
    """Minimal test-side PNG writer (spec-straight: IHDR/IDAT/IEND,
    chosen per-row filter types) so the decoder is checked against an
    INDEPENDENT encoder, not itself."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0]) // nch
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    filters = filters or [0] * h
    raw = bytearray()
    prev = bytearray(w * nch)
    for y, row in enumerate(pixels):
        f = filters[y]
        raw.append(f)
        line = bytearray(row)
        enc = bytearray(line)
        for i in range(len(line)):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif f == 3:
                enc[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw.extend(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_real_png_decode(spark):
    from teleco_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_batch,
        decode_png,
    )

    # 4x3 RGB gradient exercising every filter type, + a grey image
    rgb = [
        bytes(((x * 37 + y * 11 + c * 5) & 0xFF) for x in range(4) for c in range(3))
        for y in range(3)
    ]
    png_rgb = _encode_png(rgb, 3, filters=[0, 1, 2])
    png_rgb_paeth = _encode_png(rgb, 3, filters=[3, 4, 4])
    grey = [bytes((x * 50 + y) & 0xFF for x in range(5)) for y in range(2)]
    png_grey = _encode_png(grey, 1, filters=[2, 1])
    exp_rgb = round(sum(sum(r) for r in rgb) / (3 * 4 * 3), 4)
    exp_grey = round(sum(sum(r) for r in grey) / (2 * 5), 4)

    # pure-function check: filters must not change the decoded pixels
    assert decode_png(png_rgb) == (4, 3, exp_rgb)
    assert decode_png(png_rgb_paeth) == (4, 3, exp_rgb)
    assert decode_png(png_grey) == (5, 2, exp_grey)
    assert decode_png(b"\x89PNG\r\n\x1a\n" + b"junk") is None

    # through the Arrow-batched Spark path, mixed with undecodables
    rows = [
        (1, png_rgb, "image/png", (4, 3, None)),
        (2, png_grey, "image/png", (5, 2, None)),
        (3, b"\xff\xd8\xffjpegish", "image/jpeg", (None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_image_batch(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (4, 3)
    assert got[1]["pixels_mean"] == exp_rgb
    assert (got[2]["width"], got[2]["height"]) == (5, 2)
    assert got[2]["pixels_mean"] == exp_grey
    assert got[3]["width"] is None and got[3]["pixels_mean"] is None


def test_session_window_matches_lag_cumsum_sessionize(spark):
    """Built-in session_window and the plans/events.py lag/cumsum
    sessionization must produce identical session partitions (bounds
    differ by construction: session_window end = last event + gap)."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries
    from teleco_etl_pipeline_spark.sources.tables import load_table
    from teleco_etl_pipeline_spark.streaming.stateful import session_windows

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    native = session_windows(ev, gap="30 minutes")
    manual = all_queries()["events_sessionize"].build(spark, sf_dir)

    def sig(df, start_col):
        return sorted(
            (r["user_id"], r[start_col], r["n_events"]) for r in df.collect()
        )

    native_sig = [
        (u, int(s.timestamp() * 1_000_000), n)
        for u, s, n in sig(native, "session_start")
    ]
    manual_sig = sig(manual, "session_start_us")
    assert native_sig == manual_sig


def test_transform_with_state_accumulates_across_batches(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 API): same cumulative
    semantics as the applyInPandasWithState twin."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python runner speaks protobuf to the "
        "JVM; the lib is absent in this container (works where "
        "pyspark[connect] deps are installed)",
    )
    from teleco_etl_pipeline_spark.streaming.stateful import running_user_totals_tws

    watch = tmp_path / "ev"
    watch.mkdir()
    (watch / "b1.csv").write_text("user_id,value\n1,10.0\n1,5.0\n2,1.0\n")
    (watch / "b2.csv").write_text("user_id,value\n1,2.5\n3,7.0\n")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    stream = (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .load(str(watch))
    )
    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        emitted.extend(
            (batch_id, r["user_id"], r["n_events"], r["total_value"])
            for r in batch_df.collect()
        )

    q = (
        running_user_totals_tws(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    finals = {}
    for _bid, uid, n, tot in sorted(emitted):
        finals[uid] = (n, tot)
    assert finals == {1: (3, 17.5), 2: (1, 1.0), 3: (1, 7.0)}


def test_apply_in_pandas_with_state_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key state must persist across
    micro-batches (one file per trigger → 2 batches)."""
    from teleco_etl_pipeline_spark.streaming.stateful import running_user_totals

    watch = tmp_path / "ev"
    watch.mkdir()
    (watch / "b1.csv").write_text("user_id,value\n1,10.0\n1,5.0\n2,1.0\n")
    (watch / "b2.csv").write_text("user_id,value\n1,2.5\n3,7.0\n")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    stream = (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .load(str(watch))
    )
    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        emitted.extend(
            (batch_id, r["user_id"], r["n_events"], r["total_value"])
            for r in batch_df.collect()
        )

    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    finals = {}
    for _bid, uid, n, tot in sorted(emitted):
        finals[uid] = (n, tot)
    assert finals == {1: (3, 17.5), 2: (1, 1.0), 3: (1, 7.0)}
    # user 1 appears in both batches → two emissions, the second
    # cumulative over the first (file→batch order is mtime-tied and
    # not deterministic, so assert shape, not order).
    user1 = [(n, tot) for _b, u, n, tot in sorted(emitted) if u == 1]
    assert len(user1) == 2
    assert user1[-1] == (3, 17.5)
    assert user1[0][0] < 3  # first batch saw a strict subset


def test_resize_plan_and_payload_path_agree(spark):
    """The metadata resize PLAN and the payload path (here in its
    fake=True plumbing mode over non-PNG payloads; the real PNG mode
    is covered by test_resize_image_batch_real_path) apply the same
    fit-within integer math: feeding the plan the fake
    decoder's dims must reproduce the batch output exactly. Also
    covers the edge cases: upscale suppression (small image passes
    through) and extreme aspect ratio (dim clamps to >= 1)."""
    from pyspark.sql import functions as F

    from teleco_etl_pipeline_spark.operators.multimodal import (
        decode_image_batch,
        resize_image_batch,
        resize_plan,
        synthetic_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} payload text") for i in range(24)], ["doc_id", "text"]
    )
    media = synthetic_media_from_documents(docs)

    # payload path (fake decode dims → fit-within)
    sized = {
        r["media_id"]: (r["out_w"], r["out_h"])
        for r in resize_image_batch(media, max_w=48, max_h=40, fake=True).collect()
    }
    # metadata plan fed the SAME fake-decoded dims
    decoded = decode_image_batch(media, fake=True).select(
        "media_id",
        F.struct(
            F.col("width"), F.col("height"), F.lit(None).cast("int").alias("duration_ms")
        ).alias("meta"),
    )
    planned = {
        r["media_id"]: (r["out_w"], r["out_h"])
        for r in resize_plan(decoded, max_w=48, max_h=40).collect()
    }
    assert sized == planned and len(sized) == 24

    # upscale suppression + >=1 clamp on a degenerate aspect ratio
    crafted = spark.createDataFrame(
        [(1, 10, 10, None), (2, 10000, 1, None)],
        "media_id long, width int, height int, duration_ms int",
    ).select(
        "media_id",
        F.struct("width", "height", "duration_ms").alias("meta"),
    )
    out = {
        r["media_id"]: (r["out_w"], r["out_h"], r["downscaled"])
        for r in resize_plan(crafted, max_w=512, max_h=384).collect()
    }
    assert out[1] == (10, 10, False)      # no upscale
    assert out[2] == (512, 1, True)       # floor(1*512/10000)=0 → clamp 1


def test_resize_plan_invariants_dense_grid(spark):
    """Fit-within invariants over a dense grid of dims, verified in
    ONE Spark job: output within the target box (unless the input
    already fits), dims never below 1, no upscaling, and aspect ratio
    preserved to within integer rounding (cross-multiplied bound)."""
    from pyspark.sql import functions as F

    from teleco_etl_pipeline_spark.operators.multimodal import resize_plan

    MAX_W, MAX_H = 512, 384
    dims = [
        (i, w, h)
        for i, (w, h) in enumerate(
            (w, h)
            for w in [1, 2, 3, 17, 100, 383, 384, 385, 511, 512, 513, 1000, 7919]
            for h in [1, 2, 3, 19, 99, 383, 384, 385, 511, 512, 513, 999, 7907]
        )
    ]
    media = spark.createDataFrame(dims, "media_id long, w int, h int").select(
        "media_id",
        F.struct(
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    rows = resize_plan(media, max_w=MAX_W, max_h=MAX_H).collect()
    assert len(rows) == len(dims)
    for r in rows:
        w, h, ow, oh = r["width"], r["height"], r["out_w"], r["out_h"]
        assert ow >= 1 and oh >= 1, r
        if w <= MAX_W and h <= MAX_H:
            assert (ow, oh) == (w, h) and not r["downscaled"], r
        else:
            assert r["downscaled"] and ow <= MAX_W and oh <= MAX_H, r
            assert ow <= w and oh <= h, r  # never upscale
            # aspect preserved to integer rounding:
            # |ow/oh - w/h| bounded by one rounding step on each axis
            assert abs(ow * h - oh * w) <= max(w, h), r


def test_streaming_watermark_drops_too_late_rows(spark, tmp_path):
    """True streaming late-data semantics across micro-batches (the
    batch-mode twin above only checks plan shape): after the
    watermark passes a window's end, a late row for that window is
    DROPPED — its count never updates — while a late-but-within-
    watermark row still aggregates."""
    import json as _json

    from teleco_etl_pipeline_spark.streaming.file_stream import watermarked_counts

    src = tmp_path / "events"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )

    def _write(name, rows):
        (src / name).write_text(
            "\n".join(_json.dumps({"ts": ts, "event_type": et}) for ts, et in rows)
        )

    # Batch 1: e1 in window [00:00,00:10); e2 at 00:20 advances the
    # watermark to 00:15 (threshold 5 min) for the NEXT batch.
    _write("b1.json", [("2026-01-01T00:05:00", "e1"), ("2026-01-01T00:20:00", "e2")])

    counts = watermarked_counts(
        spark.readStream.schema(schema).json(str(src)),
        late_threshold="5 minutes",
    )
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName("wmc")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # Batch 2: e1 at 00:02 targets the [00:00,00:10) window whose
        # end (00:10) is behind the watermark (00:15) → dropped.
        # e3 at 00:12 targets [00:10,00:20), end 00:20 > watermark →
        # aggregated.
        _write(
            "b2.json",
            [("2026-01-01T00:02:00", "e1"), ("2026-01-01T00:12:00", "e3")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM wmc").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r["window_start"].minute, r["event_type"]), []).append(
            r["cnt"]
        )
    # The dropped late row never produced an updated count for e1.
    assert by_key[(0, "e1")] == [1]
    # The within-watermark late row DID aggregate.
    assert by_key[(10, "e3")] == [1]
    assert by_key[(20, "e2")] == [1]


def test_streaming_scd2_matches_batch_rebuild(spark, tmp_path):
    """Two change files drained as separate micro-batch groups must
    leave the SCD2 dim identical to a one-shot batch rebuild over the
    concatenated change log."""
    from teleco_etl_pipeline_spark.operators.scd import scd2_from_changes
    from teleco_etl_pipeline_spark.streaming.file_stream import (
        file_arrival_stream,
        foreach_batch_scd2,
    )

    watch = tmp_path / "cdc"
    watch.mkdir()
    dim_path = str(tmp_path / "dim_history")
    ckpt = str(tmp_path / "ckpt_scd2")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("eid", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    args = dict(
        key_cols=["k"], ts_us_col="ts_us", attr_cols=["v"], tiebreak_col="eid"
    )

    (watch / "day1.csv").write_text("k,eid,ts_us,v\n1,10,100,a\n1,12,300,b\n2,20,150,x\n")
    q = foreach_batch_scd2(
        file_arrival_stream(spark, str(watch), schema), ckpt, dim_path, **args
    )
    q.awaitTermination(60)
    (watch / "day2.csv").write_text("k,eid,ts_us,v\n1,30,400,b\n2,31,500,y\n3,32,450,n\n")
    q2 = foreach_batch_scd2(
        file_arrival_stream(spark, str(watch), schema), ckpt, dim_path, **args
    )
    q2.awaitTermination(60)

    all_changes = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 12, 300, "b"), (2, 20, 150, "x"),
         (1, 30, 400, "b"), (2, 31, 500, "y"), (3, 32, 450, "n")],
        ["k", "eid", "ts_us", "v"],
    )
    expect = scd2_from_changes(all_changes, **args)

    def canon(df):
        return sorted(
            (r["k"], r["v"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
            for r in df.collect()
        )

    got = spark.read.parquet(dim_path).select(*expect.columns)
    assert canon(got) == canon(expect)


def test_media_builders_pickle_by_value(tmp_path):
    """The _media_from_documents contract (r10 ADVICE): every
    generator's build closure — including its references to the
    module-level encoder globals — must unpickle and RUN in a Python
    process where this repo is NOT importable. The encoder globals
    are factory closures (qualname `_png_encode_fn.<locals>.encode`),
    so cloudpickle's importability check fails and serializes them by
    value; this test pins that property against a refactor that
    hoists an encoder to a plain module-level def (which WOULD pickle
    by reference and break the harness's executors)."""
    import subprocess
    import sys as _sys

    from pyspark import cloudpickle

    from teleco_etl_pipeline_spark.operators.multimodal import (
        encode_ebml,
        encode_png,
        encode_wav,
    )

    def build_png(mid: int) -> bytes:
        w, h = 8 + mid % 16, 6 + mid % 12
        rows = [
            bytes((mid * 31 + y * w + x) % 256 for x in range(w))
            for y in range(h)
        ]
        return encode_png(w, h, rows, nch=1, filt=lambda y: y % 3)

    def build_wav(mid: int) -> bytes:
        n = 64 + mid % 128
        return encode_wav(
            8000, [((mid * 37 + i * 11) % 2048) - 1024 for i in range(n)]
        )

    def build_ebml(mid: int) -> bytes:
        return encode_ebml(float(500 + (mid % 5) * 1000), 1 + mid % 3)

    blob_path = tmp_path / "builders.pkl"
    blob_path.write_bytes(
        cloudpickle.dumps([build_png, build_wav, build_ebml])
    )
    probe = (
        "import sys\n"
        "sys.path = [p for p in sys.path if 'repo' not in p]\n"
        "from pyspark import cloudpickle\n"
        f"fns = cloudpickle.loads(open({str(blob_path)!r},'rb').read())\n"
        "lens = [len(f(5)) for f in fns]\n"
        "assert all(n > 0 for n in lens), lens\n"
        "print('OK', lens)\n"
    )
    r = subprocess.run(
        [_sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=120,
    )
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]


def test_png_bounded_inflate_rejects_oversize_idat():
    """r10 ADVICE: a corrupt PNG whose tiny IDAT inflates far past
    the IHDR-implied raster must be REJECTED without materializing
    the inflated buffer (decompressobj max_length cap). Valid
    payloads — including one whose stream ends exactly at the bound —
    still decode."""
    import struct
    import zlib

    from teleco_etl_pipeline_spark.operators.multimodal import (
        encode_png,
        png_pixels,
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    # 4x3 greyscale header, but IDAT inflates to 64 MiB of zeros
    # (compressed to ~64 KiB) — far past the 3*(4+1)=15-byte bound.
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(64 * 1024 * 1024)))
        + chunk(b"IEND", b"")
    )
    assert png_pixels(bomb) is None
    # control: a genuine 4x3 payload still decodes
    rows = [bytes((y * 4 + x) % 256 for x in range(4)) for y in range(3)]
    ok = png_pixels(encode_png(4, 3, rows, nch=1))
    assert ok is not None and [bytes(r) for r in ok[3]] == rows


def test_png_encoder_roundtrip_and_nn_resample():
    """r10 resize-execute foundations, pure-function level: the
    module's own encoder must round-trip bit-exact through the
    decoder for every filter it writes (and agree with the
    INDEPENDENT test-side writer), and the NN resampler must match a
    brute-force index-formula reference, with identity at fitting
    dims."""
    from teleco_etl_pipeline_spark.operators.multimodal import (
        encode_png,
        nn_resample,
        png_pixels,
    )

    for mid, w, h, nch in [(0, 8, 6, 1), (7, 23, 17, 1), (3, 5, 9, 3)]:
        rows = [
            bytes((mid * 31 + y * w * nch + i) % 256 for i in range(w * nch))
            for y in range(h)
        ]
        blob = encode_png(w, h, rows, nch=nch, filt=lambda y: y % 3)
        got = png_pixels(blob)
        assert got is not None
        gw, gh, gnch, grows = got
        assert (gw, gh, gnch) == (w, h, nch)
        assert [bytes(r) for r in grows] == rows
        # independent writer (all five filter types) → same pixels
        indep = _encode_png(rows, nch, filters=[(y % 5) for y in range(h)])
        got2 = png_pixels(indep)
        assert [bytes(r) for r in got2[3]] == rows
        # NN resample vs the index formula, plus identity
        for ow, oh in [(w, h), (3, 2), (1, 1), (w // 2 + 1, h // 2 + 1)]:
            res = nn_resample(grows, w, h, nch, ow, oh)
            for y in range(oh):
                for x in range(ow):
                    sy, sx = (y * h) // oh, (x * w) // ow
                    assert (
                        res[y][x * nch : (x + 1) * nch]
                        == grows[sy][sx * nch : (sx + 1) * nch]
                    )
        assert [bytes(r) for r in nn_resample(grows, w, h, nch, w, h)] == rows


def test_resize_exec_spark_path_matches_python(spark):
    """The full Spark resize-execute path (genuine PNG payloads →
    stdlib decode → NN resample → exact integer sums) must equal a
    straight Python evaluation of the same closed forms."""
    from teleco_etl_pipeline_spark.operators.multimodal import (
        png_media_from_documents,
        resize_png_exact,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    got = {
        r["media_id"]: r
        for r in resize_png_exact(
            png_media_from_documents(docs), max_w=12, max_h=9
        ).collect()
    }
    assert len(got) == 40
    for mid in range(40):
        w, h = 8 + mid % 16, 6 + mid % 12
        if w <= 12 and h <= 9:
            ow, oh = w, h
        elif 12 * h <= 9 * w:
            ow, oh = 12, max(1, (h * 12) // w)
        else:
            ow, oh = max(1, (w * 9) // h), 9
        exp = sum(
            (mid * 31 + ((y * h) // oh) * w + ((x * w) // ow)) % 256
            for y in range(oh)
            for x in range(ow)
        )
        r = got[mid]
        assert (r["out_w"], r["out_h"]) == (ow, oh)
        assert r["px_sum"] == exp and r["n_px"] == ow * oh


def test_resize_image_batch_real_path(spark):
    """resize_image_batch(fake=False) — previously the declared
    NotImplementedError stub — now decodes and resamples real PNGs;
    non-PNG payloads yield NULLs."""
    from teleco_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_image_batch,
    )

    grey = [bytes((x * 7 + y) & 0xFF for x in range(20)) for y in range(10)]
    blob = _encode_png(grey, 1, filters=[(y % 5) for y in range(10)])
    rows = [
        (1, blob, "image/png", (20, 10, None)),
        (2, b"\xff\xd8\xffnope", "image/jpeg", (None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in resize_image_batch(media, max_w=10, max_h=8).collect()
    }
    # 20x10 into (10, 8): width-bound (10*10 <= 8*20) → (10, 5)
    assert (got[1]["out_w"], got[1]["out_h"]) == (10, 5)
    exp = round(
        sum(grey[(y * 10) // 5][(x * 20) // 10] for y in range(5) for x in range(10))
        / 50.0,
        4,
    )
    assert got[1]["pixels_mean"] == exp
    assert got[2]["out_w"] is None and got[2]["pixels_mean"] is None


def test_wav_encoder_roundtrip_and_decimate(spark):
    """Audio twin of the PNG round-trip pins: the module's WAV
    encoder must round-trip bit-exact through the chunk-walking
    decoder (mono and stereo), the decimator must match the NN index
    formula, and non-WAV payloads must yield NULLs through the
    Spark path."""
    from teleco_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decimate_wav_exact,
        encode_wav,
        wav_pcm,
    )

    mono = [((i * 31) % 2048) - 1024 for i in range(100)]
    blob = encode_wav(8000, mono)
    got = wav_pcm(blob)
    assert got == (8000, 1, mono)
    stereo = [((i * 7) % 512) - 256 for i in range(80)]  # 40 frames
    got2 = wav_pcm(encode_wav(16000, stereo, nch=2))
    assert got2 == (16000, 2, stereo)
    assert wav_pcm(b"RIFFxxxxWAVEjunk") is None
    assert wav_pcm(b"\x89PNG\r\n\x1a\n") is None

    rows = [
        (1, blob, "audio/wav", (None, None, None)),
        (2, b"RIFFnope", "audio/wav", (None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in decimate_wav_exact(media, out_n=32).collect()
    }
    exp = sum(abs(mono[(i * 100) // 32]) for i in range(32))
    r1 = out[1]
    assert (r1["sample_rate"], r1["n_samples"], r1["decim_n"]) == (8000, 100, 32)
    assert r1["abs_sum"] == exp
    assert out[2]["abs_sum"] is None


def test_ebml_roundtrip_and_probe(spark):
    """Video-container twin of the PNG/WAV round-trip pins: the EBML
    writer must round-trip through the varint walker (including a
    multi-byte-size body and a non-default timecode scale), and
    garbage / sniff-only payloads must yield NULLs via Spark."""
    from teleco_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        ebml_probe,
        encode_ebml,
        probe_video_batch,
    )

    assert ebml_probe(encode_ebml(3500.0, 2)) == (1000000, 3500.0, 2)
    # non-default scale + enough tracks to push the Segment size
    # into a 2-byte varint
    blob = encode_ebml(12345.0, 40, scale=500000)
    # Segment body exceeds 126 bytes, so its size is a 2-byte vint
    # (visible as the 0x40xx marker) — the multi-byte reader path.
    assert len(blob) > 200 and b"\x18S\x80g\x40" in blob
    assert ebml_probe(blob) == (500000, 12345.0, 40)
    assert ebml_probe(b"\x1aE\xdf\xa3" + b"not ebml at all") is None
    assert ebml_probe(b"RIFF....WAVE") is None

    rows = [
        (1, encode_ebml(1500.0, 3), "video/webm", (None, None, 1500)),
        (2, b"\x1aE\xdf\xa3junk", "video/webm", (None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in probe_video_batch(media).collect()}
    assert (
        got[1]["timecode_scale"],
        got[1]["duration_ms"],
        got[1]["n_tracks"],
    ) == (1000000, 1500, 3)
    assert got[2]["duration_ms"] is None


def test_wav_truncated_chunk_is_undecodable():
    # A data chunk whose declared length exceeds the payload is
    # corrupt media, not shorter media — must yield None rather than
    # a plausible partial decode (review finding, r10).
    from teleco_etl_pipeline_spark.operators.multimodal import (
        encode_wav,
        wav_pcm,
    )

    blob = encode_wav(8000, [1, -2, 3, -4, 5])
    assert wav_pcm(blob) == (8000, 1, [1, -2, 3, -4, 5])
    assert wav_pcm(blob[:-4]) is None  # truncated data chunk
    assert wav_pcm(blob[:-1]) is None


def test_media_codec_roundtrips_property():
    """Hypothesis property pins for the three pure-stdlib codecs:
    arbitrary pixel grids / sample vectors / duration-track combos
    must round-trip bit-exact through encode -> decode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from teleco_etl_pipeline_spark.operators.multimodal import (
        ebml_probe,
        encode_ebml,
        encode_png,
        encode_wav,
        png_pixels,
        wav_pcm,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 10),
        nch=st.sampled_from([1, 3]),
        seed=st.integers(0, 2**31),
    )
    def png_rt(w, h, nch, seed):
        rows = [
            bytes((seed + y * w * nch + i) % 256 for i in range(w * nch))
            for y in range(h)
        ]
        got = png_pixels(encode_png(w, h, rows, nch=nch, filt=lambda y: y % 3))
        assert got is not None
        assert (got[0], got[1], got[2]) == (w, h, nch)
        assert [bytes(r) for r in got[3]] == rows

    @settings(max_examples=30, deadline=None)
    @given(
        samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
        rate=st.sampled_from([8000, 16000, 44100]),
        nch=st.sampled_from([1, 2]),
    )
    def wav_rt(samples, rate, nch):
        if nch == 2 and len(samples) % 2:
            samples = samples + [0]
        assert wav_pcm(encode_wav(rate, samples, nch=nch)) == (
            rate,
            nch,
            samples,
        )

    @settings(max_examples=30, deadline=None)
    @given(
        dur=st.integers(0, 10**9),
        tracks=st.integers(0, 200),
        scale=st.integers(1, 2**40),
    )
    def ebml_rt(dur, tracks, scale):
        got = ebml_probe(encode_ebml(float(dur), tracks, scale=scale))
        assert got == (scale, float(dur), tracks)

    png_rt()
    wav_rt()
    ebml_rt()
