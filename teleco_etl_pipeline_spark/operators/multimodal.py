"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (BASELINE north-star operator family).

The Spark-side contract is fully real and tested:
- schema: ``binary`` payload + metadata struct (mime, width, height,
  duration_ms, …)
- partition-aware batch processing through ``mapInPandas`` (Arrow
  batches, bounded memory — never collect, never per-row Python)
- deterministic feature extraction over the raw bytes (length,
  sha-like rolling checksum, magic-byte sniffing) that exercises the
  full path without media libraries

Decode status: ``decode_image_batch`` is REAL for PNG — a pure-stdlib
decoder (zlib inflate + scanline unfiltering, see ``_png_decode_fn``)
since round 9; undecodable payloads yield NULL feature columns. Its
``fake=True`` mode keeps the deterministic checksum-seeded fake for
plumbing tests over arbitrary payloads. Audio/video decode
(librosa/ffmpeg) and raster RESIZE remain stubbed —
``resize_plan``'s execute path still raises NotImplementedError
unless ``fake=True`` (those libs aren't in this container).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("sniffed_type", T.StringType(), True),
    ]
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"\x1aE\xdf\xa3": "video/webm",
}


# Both helpers are factory-made closures rather than plain module
# functions: their qualnames (`_fn.<locals>.f`) are not addressable
# as module attributes, so cloudpickle serializes them BY VALUE into
# any mapInPandas closure that references them. A plain module-level
# def would pickle by reference and fail to unpickle on executor
# Python workers that don't have this repo on their path (the
# external harness controls cwd/PYTHONPATH, not us).


def _sniff_fn():
    magic = dict(_MAGIC)

    def sniff(payload: bytes | None) -> str:
        if not payload:
            return "unknown"
        for m, mime in magic.items():
            if payload.startswith(m):
                return mime
        return "application/octet-stream"

    return sniff


def _checksum_fn():
    def cks(payload: bytes | None) -> int:
        """Deterministic polynomial rolling hash over raw bytes."""
        h = 0
        for b in payload or b"":
            h = (h * 131 + b) & 0x7FFFFFFFFFFFFFFF
        return h

    return cks


def _png_decode_fn():
    """REAL image decode for the one format a stdlib can handle: PNG
    (public spec / RFC 2083 — zlib inflate + the five scanline
    filters), 8-bit greyscale/RGB/(A), non-interlaced. No PIL/opencv
    in this container, so this pure-stdlib decoder is what upgrades
    `decode_image_batch(fake=False)` from a NotImplementedError guard
    to a working path. Same factory-closure pickling contract as the
    helpers above (stdlib imports INSIDE the closure — executor
    workers need no repo imports).

    Scale note: filters are unfiltered per-row sequentially (Paeth is
    an inherently sequential recurrence), so this is the
    small-image metadata/thumbnail path — production frame decode at
    100 TB belongs in a vectorized native library; the Spark-side
    contract (Arrow batches via mapInPandas, bounded memory, nullable
    columns for undecodable payloads) is identical either way.

    Returns (width, height, mean_pixel) or None for anything that is
    not a decodable PNG.
    """

    def decode(p: bytes | None):
        import struct
        import zlib

        if not p or len(p) < 8 or p[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        pos, w, h, ctype, idat = 8, None, None, None, []
        try:
            while pos + 8 <= len(p):
                (ln,) = struct.unpack(">I", p[pos : pos + 4])
                typ = p[pos + 4 : pos + 8]
                data = p[pos + 8 : pos + 8 + ln]
                pos += 12 + ln  # length + type + data + crc
                if typ == b"IHDR":
                    w, h, depth, ctype, _co, _fi, inter = struct.unpack(
                        ">IIBBBBB", data
                    )
                    if depth != 8 or inter != 0 or ctype not in (0, 2, 4, 6):
                        return None
                elif typ == b"IDAT":
                    idat.append(data)
                elif typ == b"IEND":
                    break
            if not w or not h or not idat:
                return None
            nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
            raw = zlib.decompress(b"".join(idat))
            stride = w * nch
            if len(raw) < h * (stride + 1):
                return None
            total, prev, pos2 = 0, bytearray(stride), 0
            for _y in range(h):
                f = raw[pos2]
                line = bytearray(raw[pos2 + 1 : pos2 + 1 + stride])
                pos2 += 1 + stride
                if f == 1:  # Sub
                    for i in range(nch, stride):
                        line[i] = (line[i] + line[i - nch]) & 0xFF
                elif f == 2:  # Up
                    for i in range(stride):
                        line[i] = (line[i] + prev[i]) & 0xFF
                elif f == 3:  # Average
                    for i in range(stride):
                        a = line[i - nch] if i >= nch else 0
                        line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    for i in range(stride):
                        a = line[i - nch] if i >= nch else 0
                        b = prev[i]
                        c = prev[i - nch] if i >= nch else 0
                        pp = a + b - c
                        pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                        pred = (
                            a
                            if pa <= pb and pa <= pc
                            else (b if pb <= pc else c)
                        )
                        line[i] = (line[i] + pred) & 0xFF
                elif f != 0:
                    return None
                total += sum(line)
                prev = line
            return (int(w), int(h), round(total / (h * stride), 4))
        except Exception:
            return None

    return decode


sniff_mime = _sniff_fn()
_rolling_checksum = _checksum_fn()
decode_png = _png_decode_fn()


def extract_binary_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps memory bounded to one Arrow batch per core; at
    100 TB the scan parallelizes by file split and no payload ever
    crosses the driver.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "checksum": pdf["payload"].map(_rolling_checksum),
                    "sniffed_type": pdf["payload"].map(sniff_mime),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixels_mean", T.DoubleType(), True),
    ]
)


def decode_image_batch(media: DataFrame, fake: bool = False) -> DataFrame:
    """Image decode → (width, height, mean pixel) features.

    ``fake=False`` (default) runs the REAL stdlib PNG decoder
    (``decode_png``: zlib inflate + scanline unfiltering, 8-bit
    non-interlaced) — payloads that are not decodable PNGs yield
    NULL feature columns, the standard multimodal-pipeline contract
    (decode failures are data, not exceptions). ``fake=True`` keeps
    the deterministic checksum-seeded fake so tests can cover the
    plumbing with arbitrary non-PNG payloads.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            if fake:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": payloads.map(
                            lambda p: 16 + (_rolling_checksum(p) % 64)
                        ),
                        "height": payloads.map(
                            lambda p: 16 + ((_rolling_checksum(p) >> 8) % 64)
                        ),
                        "pixels_mean": payloads.map(
                            lambda p: round(
                                (_rolling_checksum(p) % 25600) / 100.0, 2
                            )
                        ),
                    }
                )
                continue
            decoded = payloads.map(decode_png)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": decoded.map(lambda d: d[0] if d else None),
                    "height": decoded.map(lambda d: d[1] if d else None),
                    "pixels_mean": decoded.map(
                        lambda d: d[2] if d else None
                    ),
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: payload =
    format magic bytes (by doc_id mod 4) + UTF-8 text bytes, duration
    from doc_id. Pure column expressions → reproducible on any engine,
    which is what lets the binary mapInPandas path have a SQL oracle."""
    mod = F.col("doc_id") % 4
    magic = (
        F.when(mod == 0, F.lit(b"\x89PNG"))
        .when(mod == 1, F.lit(b"\xff\xd8\xff"))
        .when(mod == 2, F.lit(b"RIFF"))
        .otherwise(F.lit(b"\x1aE\xdf\xa3"))
    )
    duration_ms = ((F.col("doc_id") % 5) * 1000 + 500).cast("int")
    # Deterministic pixel dims (spanning below/above typical resize
    # targets) so metadata-only planning ops are oracle-checkable.
    width = (F.lit(160) + (F.col("doc_id") % 13) * 96).cast("int")
    height = (F.lit(120) + (F.col("doc_id") % 11) * 72).cast("int")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(magic, F.encode(F.col("text"), "UTF-8")).alias("payload"),
        F.when(mod == 1, F.lit("image/jpeg"))
        .when(mod == 0, F.lit("image/png"))
        .when(mod == 2, F.lit("audio/wav"))
        .otherwise(F.lit("video/webm"))
        .alias("mime"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            duration_ms.alias("duration_ms"),
        ).alias("meta"),
    )


def resize_plan(media: DataFrame, max_w: int = 512, max_h: int = 384) -> DataFrame:
    """Fit-within resize *plan* from metadata only: output dims for a
    downscale into (max_w, max_h) preserving aspect ratio, upscales
    suppressed. Returns (media_id, width, height, out_w, out_h,
    downscaled).

    The 100 TB point: this is pure integer column arithmetic over the
    metadata struct — the expensive payload decode+resample is only
    owed to rows where ``downscaled`` is true, so the pipeline filters
    on a metadata predicate BEFORE touching a single payload byte
    (binary columns are pruned at the parquet scan). Integer-rational
    math (compare max_w·h vs max_h·w, floor-divide) instead of a
    double scale factor keeps the dims bit-identical across engines.
    """
    # Widen BEFORE multiplying: int32 products overflow (ANSI error /
    # silent wrap) for dims past ~2^31/max_target even though each
    # dim alone fits an int.
    w, h = F.col("meta.width").cast("long"), F.col("meta.height").cast("long")
    fits = (w <= max_w) & (h <= max_h)
    # min(max_w/w, max_h/h) chosen rationally: width-bound wins iff
    # max_w·h <= max_h·w; floor-divisions stay in exact integer math.
    width_bound = (F.lit(max_w) * h) <= (F.lit(max_h) * w)
    out_w = F.when(fits, w).otherwise(
        F.when(width_bound, F.lit(max_w)).otherwise((w * max_h) / h)
    )
    out_h = F.when(fits, h).otherwise(
        F.when(width_bound, (h * max_w) / w).otherwise(F.lit(max_h))
    )
    return media.select(
        "media_id",
        w.cast("int").alias("width"),
        h.cast("int").alias("height"),
        F.greatest(F.floor(out_w), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(out_h), F.lit(1)).cast("int").alias("out_h"),
        (~fits).alias("downscaled"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
        T.StructField("pixels_mean", T.DoubleType(), True),
    ]
)


def resize_image_batch(
    media: DataFrame, max_w: int = 512, max_h: int = 384, fake: bool = False
) -> DataFrame:
    """Payload-path resize: decode → resample → re-encode features,
    batched through ``mapInPandas`` (Arrow, bounded memory).

    STUB: real resampling requires PIL/opencv (not in this
    container). ``fake=True`` uses the deterministic fake decoder's
    dims and applies the SAME fit-within integer math as
    :func:`resize_plan`, so the payload path and the metadata plan
    are cross-checkable (asserted in tests/test_ml_streaming_
    multimodal.py)."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv; not available in this "
            "environment — run with fake=True to exercise the plumbing"
        )

    def _fit(w: int, h: int) -> tuple[int, int]:
        if w <= max_w and h <= max_h:
            return w, h
        if max_w * h <= max_h * w:
            return max_w, max(1, (h * max_w) // w)
        return max(1, (w * max_h) // h), max_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [
                _fit(
                    16 + (_rolling_checksum(p) % 64),
                    16 + ((_rolling_checksum(p) >> 8) % 64),
                )
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": [d[0] for d in dims],
                    "out_h": [d[1] for d in dims],
                    "pixels_mean": payloads.map(
                        lambda p: round((_rolling_checksum(p) % 25600) / 100.0, 2)
                    ),
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def _register_queries() -> None:
    # Local import: registry.all_queries() imports this module, so the
    # decorator import stays function-scoped to avoid a cycle.
    from teleco_etl_pipeline_spark.plans.registry import query
    from teleco_etl_pipeline_spark.sources.tables import load_table

    @query(
        "multimodal_features",
        """
        SELECT doc_id AS media_id,
               CAST(strlen(text) + CASE WHEN doc_id % 4 = 1 THEN 3 ELSE 4 END
                    AS INTEGER) AS n_bytes,
               CASE doc_id % 4 WHEN 0 THEN 'image/png'
                               WHEN 1 THEN 'image/jpeg'
                               WHEN 2 THEN 'audio/wav'
                               ELSE 'video/webm' END AS sniffed_type
        FROM documents
        """,
        doc="Binary-column feature extraction (length + magic-byte "
        "sniffing) through Arrow-batched mapInPandas over synthetic "
        "media payloads — the multimodal slow-path plumbing, with a "
        "real oracle because the payload construction is deterministic.",
    )
    def q_multimodal_features(spark, sf_dir):
        media = synthetic_media_from_documents(load_table(spark, sf_dir, "documents"))
        return extract_binary_features(media).select(
            "media_id", "n_bytes", "sniffed_type"
        )

    @query(
        "multimodal_frame_sample",
        """
        SELECT media_id, CAST(f AS INTEGER) AS frame_ts_ms FROM (
            SELECT doc_id AS media_id,
                   unnest(range(0, (doc_id % 5) * 1000 + 500, 1000)) AS f
            FROM documents
        )
        """,
        doc="Video frame-sampling plan: one row per sampled frame "
        "timestamp via explode(sequence(...)) over metadata — the "
        "timeline-explode shape real frame extraction hangs off.",
    )
    def q_multimodal_frame_sample(spark, sf_dir):
        media = synthetic_media_from_documents(load_table(spark, sf_dir, "documents"))
        return frame_sample_plan(media, every_ms=1000)

    @query(
        "multimodal_resize_plan",
        """
        WITH m AS (
          SELECT doc_id AS media_id,
                 CAST(160 + (doc_id % 13) * 96 AS INTEGER) AS width,
                 CAST(120 + (doc_id % 11) * 72 AS INTEGER) AS height
          FROM documents
        )
        SELECT media_id, width, height,
               CAST(GREATEST(
                 CASE WHEN width <= 512 AND height <= 384 THEN width
                      WHEN 512 * height <= 384 * width THEN 512
                      ELSE (width * 384) // height END, 1) AS INTEGER) AS out_w,
               CAST(GREATEST(
                 CASE WHEN width <= 512 AND height <= 384 THEN height
                      WHEN 512 * height <= 384 * width THEN (height * 512) // width
                      ELSE 384 END, 1) AS INTEGER) AS out_h,
               NOT (width <= 512 AND height <= 384) AS downscaled
        FROM m
        """,
        doc="Metadata-only fit-within resize planning: output dims "
        "and a downscale flag from the metadata struct alone, so the "
        "expensive payload decode+resample is owed only to rows the "
        "plan marks downscaled — the binary column is never read for "
        "the rest (metadata predicate prunes decode work). Integer-"
        "rational math keeps dims bit-identical across engines; the "
        "payload-path twin (resize_image_batch, mapInPandas) applies "
        "the same math and is cross-checked in tests.",
    )
    def q_multimodal_resize_plan(spark, sf_dir):
        media = synthetic_media_from_documents(load_table(spark, sf_dir, "documents"))
        return resize_plan(media, max_w=512, max_h=384)


_register_queries()


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, derived from metadata only (decode stubbed). Shows the
    explode-by-timeline shape used for real frame extraction."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)
                ),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
