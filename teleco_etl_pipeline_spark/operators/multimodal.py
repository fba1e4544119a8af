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

Decode status: ``decode_image_batch`` AND the resize execute path
are REAL for PNG — a pure-stdlib decoder (zlib inflate + all five
scanline unfilters, ``_png_pixels_fn``, since r9), a matching
encoder (``_png_encode_fn``, r10), and a nearest-neighbor resampler
(``nn_resample`` / ``resize_png_exact``, r10 — the last declared
stub, removed); undecodable payloads yield NULL feature columns.
``fake=True`` modes keep the deterministic checksum-seeded fakes for
plumbing tests over arbitrary non-PNG payloads. AUDIO decode is also
REAL for the canonical container: a pure-stdlib RIFF/WAVE PCM-16
chunk-walking parser + encoder (``_wav_pcm_fn`` / ``_wav_encode_fn``,
r10) with nearest-sample decimation (``decimate_wav_exact`` — the
frame-sample operation for audio). Video decode (ffmpeg-class
codecs) remains out of scope for this container; the batch contract
such a library would slot into is the same mapInPandas shape every
real path here uses.
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


def _png_pixels_fn():
    """REAL image decode for the one format a stdlib can handle: PNG
    (public spec / RFC 2083 — zlib inflate + the five scanline
    filters), 8-bit greyscale/RGB/(A), non-interlaced. No PIL/opencv
    in this container, so this pure-stdlib decoder is what makes
    `decode_image_batch(fake=False)` and the resize execute path
    work. Same factory-closure pickling contract as the helpers
    above (stdlib imports INSIDE the closure — executor workers need
    no repo imports).

    Scale note: filters are unfiltered per-row sequentially (Paeth is
    an inherently sequential recurrence), so this is the
    small-image metadata/thumbnail path — production frame decode at
    100 TB belongs in a vectorized native library; the Spark-side
    contract (Arrow batches via mapInPandas, bounded memory, nullable
    columns for undecodable payloads) is identical either way.

    Returns the full unfiltered pixel grid ``(width, height,
    n_channels, rows: list[bytearray])`` or None for anything that is
    not a decodable PNG — the raster the resize resampler consumes.
    ``want_rows=False`` keeps only a running pixel total (two
    scanlines of memory instead of the whole raster — the feature
    decode's mean needs nothing more) and returns ``(width, height,
    n_channels, total)``.
    """

    def pixels(p: bytes | None, want_rows: bool = True):
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
            stride = w * nch
            # Bounded inflate (r10 ADVICE): cap decompression at the
            # IHDR-implied raster size instead of inflating whatever
            # the stream claims — a small corrupt/adversarial IDAT
            # can otherwise expand to a multi-GB buffer before the
            # length check ever runs. decompressobj stops at
            # max_length; any unconsumed tail means the payload
            # exceeds its own header's bound -> reject.
            bound = h * (stride + 1)
            dec = zlib.decompressobj()
            raw = dec.decompress(b"".join(idat), bound)
            if len(raw) < bound:
                return None
            # One more probe byte: if the tail still yields output,
            # the stream inflates past its own header's bound ->
            # reject (a trailing stream-end + adler32 yields none).
            if dec.unconsumed_tail and dec.decompress(
                dec.unconsumed_tail, 1
            ):
                return None
            rows, total, prev, pos2 = [], 0, bytearray(stride), 0
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
                if want_rows:
                    rows.append(line)
                else:
                    total += sum(line)
                prev = line
            return (int(w), int(h), int(nch), rows if want_rows else total)
        except Exception:
            return None

    return pixels


def _png_decode_fn():
    """(width, height, mean_pixel) features from the real PNG decode
    — the streaming fold of :func:`_png_pixels_fn` (want_rows=False:
    two scanlines of memory, never the full raster; same output
    contract as the pre-r10 decoder)."""
    _pixels = _png_pixels_fn()

    def decode(p: bytes | None):
        d = _pixels(p, want_rows=False)
        if d is None:
            return None
        w, h, nch, total = d
        return (w, h, round(total / (h * w * nch), 4))

    return decode


def _png_encode_fn():
    """Minimal REAL PNG encoder (8-bit greyscale or RGB,
    non-interlaced): the inverse of :func:`_png_pixels_fn`, used to
    manufacture genuine PNG payloads for the oracle-backed resize
    query and the round-trip property tests. ``filters`` picks the
    per-row filter type (0=None, 1=Sub, 2=Up as a function of y) so
    the decode side's unfilter paths are exercised by real data, not
    only by tests. Same self-contained-closure contract."""

    def encode(width: int, height: int, rows, nch: int = 1, filt=None):
        import struct
        import zlib

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        ctype = {1: 0, 3: 2}[nch]
        ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
        stride = width * nch
        out = bytearray()
        prev = bytearray(stride)
        for y in range(height):
            line = bytes(rows[y])
            f = 0 if filt is None else filt(y)
            out.append(f)
            if f == 0:
                out += line
            elif f == 1:  # Sub
                out += bytes(
                    (line[i] - (line[i - nch] if i >= nch else 0)) & 0xFF
                    for i in range(stride)
                )
            elif f == 2:  # Up
                out += bytes(
                    (line[i] - prev[i]) & 0xFF for i in range(stride)
                )
            else:
                raise ValueError(f"encoder supports filters 0/1/2, got {f}")
            prev = bytearray(line)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b"")
        )

    return encode


def _wav_pcm_fn():
    """REAL audio decode for the one container a stdlib can handle:
    RIFF/WAVE with 16-bit little-endian PCM (the canonical format).
    Walks the chunk list (fmt / data, tolerating extra chunks),
    validates PCM-16, and returns ``(sample_rate, n_channels,
    samples: list[int])`` (interleaved int16) or None for anything
    that is not a decodable PCM-16 WAV. Same self-contained-closure
    pickling contract as the PNG decoder."""

    def pcm(p: bytes | None):
        import struct

        if not p or len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return None
        try:
            pos, rate, nch, bits, data = 12, None, None, None, None
            while pos + 8 <= len(p):
                cid = p[pos : pos + 4]
                (ln,) = struct.unpack("<I", p[pos + 4 : pos + 8])
                body = p[pos + 8 : pos + 8 + ln]
                if len(body) < ln:
                    # a truncated chunk is CORRUPT media, not shorter
                    # media — decoding the fragment would score wrong
                    # n_samples/amplitudes as if they were real data
                    return None
                pos += 8 + ln + (ln & 1)  # chunks are word-aligned
                if cid == b"fmt ":
                    fmt, nch, rate, _br, _ba, bits = struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                    if fmt != 1:  # PCM only
                        return None
                elif cid == b"data":
                    data = body
            if rate is None or data is None or bits != 16 or not nch:
                return None
            if len(data) % 2:  # PCM-16 data must be sample-aligned
                return None
            n = len(data) // 2
            samples = list(struct.unpack(f"<{n}h", data))
            return (int(rate), int(nch), samples)
        except Exception:
            return None

    return pcm


def _wav_encode_fn():
    """Minimal REAL PCM-16 WAV encoder — the inverse of
    :func:`_wav_pcm_fn`, used to manufacture genuine audio payloads
    for the oracle-backed decode/decimate query and the round-trip
    tests."""

    def encode(rate: int, samples, nch: int = 1) -> bytes:
        import struct

        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    return encode


def _ebml_probe_fn():
    """REAL video-CONTAINER metadata parse: a pure-stdlib EBML/WebM
    walker (RFC 8794 varints — leading-zero-count length marker on
    both element IDs and sizes), descending the
    Segment → Info / Tracks masters to extract TimecodeScale,
    Duration, and the TrackEntry count. This is the ffprobe-style
    STRUCTURE parse (what a pipeline needs to route/filter/sample
    video at scale: duration, track layout) — codec frame decode
    stays out of pure-Python scope by nature. Returns
    ``(timecode_scale, duration_float, n_tracks)`` or None."""

    def probe(p: bytes | None):
        import struct

        if not p or len(p) < 4 or p[:4] != b"\x1aE\xdf\xa3":
            return None

        def read_vint(buf, pos, strip_marker):
            first = buf[pos]
            if first == 0:
                raise ValueError("invalid vint")
            n = 9 - first.bit_length()  # leading zeros + 1
            raw = int.from_bytes(buf[pos : pos + n], "big")
            if strip_marker:
                raw &= (1 << (7 * n)) - 1
            return raw, pos + n

        MASTERS = {0x18538067, 0x1549A966, 0x1654AE6B}  # Segment/Info/Tracks
        scale, dur, tracks = 1000000, None, 0

        def walk(buf, pos, end):
            nonlocal scale, dur, tracks
            while pos < end:
                eid, pos = read_vint(buf, pos, strip_marker=False)
                size, pos = read_vint(buf, pos, strip_marker=True)
                body_end = pos + size
                if eid in MASTERS:
                    walk(buf, pos, body_end)
                elif eid == 0x2AD7B1:  # TimecodeScale, uint
                    scale = int.from_bytes(buf[pos:body_end], "big")
                elif eid == 0x4489:  # Duration, float32/64
                    dur = struct.unpack(
                        ">d" if size == 8 else ">f", buf[pos:body_end]
                    )[0]
                elif eid == 0xAE:  # TrackEntry
                    tracks += 1
                pos = body_end

        try:
            walk(p, 0, len(p))
        except Exception:
            return None
        if dur is None:
            return None
        return (int(scale), float(dur), int(tracks))

    return probe


def _ebml_encode_fn():
    """Minimal REAL EBML/WebM writer — the inverse of
    :func:`_ebml_probe_fn`, manufacturing genuine container bytes
    (EBML header + Segment(Info(TimecodeScale, Duration),
    Tracks(TrackEntry…))) for the oracle-backed probe query and
    round-trip tests."""

    def encode(duration: float, n_tracks: int, scale: int = 1000000) -> bytes:
        import struct

        def vint(value: int) -> bytes:
            n = 1
            while value >= (1 << (7 * n)) - 1:
                n += 1
            return (value | (1 << (7 * n))).to_bytes(n, "big")

        def elem(eid: int, body: bytes) -> bytes:
            nid = (eid.bit_length() + 7) // 8
            return eid.to_bytes(nid, "big") + vint(len(body)) + body

        def uint_body(v: int) -> bytes:
            return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")

        info = elem(0x2AD7B1, uint_body(scale)) + elem(
            0x4489, struct.pack(">d", duration)
        )
        track_entries = b"".join(
            elem(0xAE, elem(0xD7, uint_body(i + 1))) for i in range(n_tracks)
        )
        segment_body = elem(0x1549A966, info) + elem(
            0x1654AE6B, track_entries
        )
        return elem(0x1A45DFA3, b"") + elem(0x18538067, segment_body)

    return encode


sniff_mime = _sniff_fn()
_rolling_checksum = _checksum_fn()
png_pixels = _png_pixels_fn()
decode_png = _png_decode_fn()
encode_png = _png_encode_fn()
wav_pcm = _wav_pcm_fn()
encode_wav = _wav_encode_fn()
ebml_probe = _ebml_probe_fn()
encode_ebml = _ebml_encode_fn()


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


def _fit_within_fn():
    """Fit-within output dims — the SAME exact integer-rational math
    as :func:`resize_plan` (upscales suppressed, floor-div, min 1).
    Factory-closure (the module-top pickling contract) so the ONE
    definition serves both payload resize paths and the fake
    plumbing mode — the pre-cleanup code carried three inline
    copies of this math that could silently drift."""

    def fit_within(w: int, h: int, max_w: int, max_h: int):
        if w <= max_w and h <= max_h:
            return w, h
        if max_w * h <= max_h * w:
            return max_w, max(1, (h * max_w) // w)
        return max(1, (w * max_h) // h), max_h

    return fit_within


fit_within = _fit_within_fn()


def _resized_png_sum_fn():
    """decode → fit-within → NN-resample → exact integer fold, the
    shared payload-resize kernel: returns ``(out_w, out_h, px_sum,
    n_values)`` of the RESIZED raster or None for undecodable
    payloads. The float-mean path divides the two integers; the
    exact path emits them as-is."""
    _pixels = _png_pixels_fn()
    _fit = _fit_within_fn()

    def resized_sum(p: bytes | None, max_w: int, max_h: int):
        d = _pixels(p)
        if d is None:
            return None
        w, h, nch, rows = d
        ow, oh = _fit(w, h, max_w, max_h)
        xmap = [((x * w) // ow) * nch for x in range(ow)]
        total = 0
        for y in range(oh):
            src = rows[(y * h) // oh]
            for base in xmap:
                total += sum(src[base : base + nch])
        return (ow, oh, total, ow * oh * nch)

    return resized_sum


resized_png_sum = _resized_png_sum_fn()


def nn_resample(rows, w: int, h: int, nch: int, ow: int, oh: int):
    """Nearest-neighbor resample of an unfiltered pixel grid (the
    :func:`png_pixels` output shape) to (ow, oh): source index =
    floor(dst · src / out) per axis — the standard NN mapping,
    integer-exact so oracles can recompute it. Returns the resampled
    rows (list of bytearray, stride ow·nch)."""
    out = []
    xmap = [((x * w) // ow) * nch for x in range(ow)]
    for y in range(oh):
        src = rows[(y * h) // oh]
        line = bytearray(ow * nch)
        for xi, base in enumerate(xmap):
            line[xi * nch : (xi + 1) * nch] = src[base : base + nch]
        out.append(line)
    return out


def resize_image_batch(
    media: DataFrame, max_w: int = 512, max_h: int = 384, fake: bool = False
) -> DataFrame:
    """Payload-path resize: decode → nearest-neighbor resample →
    features of the RESIZED raster, batched through ``mapInPandas``
    (Arrow, bounded memory).

    ``fake=False`` (default) is REAL for PNG payloads: the stdlib
    decoder (:func:`png_pixels`) yields the unfiltered grid, the NN
    resampler shrinks it into the fit-within box (same integer math
    as :func:`resize_plan`), and ``pixels_mean`` is the mean of the
    resampled pixels; undecodable payloads yield NULL columns (decode
    failures are data, not exceptions). ``fake=True`` keeps the
    deterministic checksum-seeded plumbing fake for arbitrary
    non-PNG payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def real(p):
            r = resized_png_sum(p, max_w, max_h)
            if r is None:
                return None
            ow, oh, total, n = r
            return (ow, oh, round(total / n, 4))

        for pdf in it:
            payloads = pdf["payload"]
            if fake:
                dims = [
                    fit_within(
                        16 + (_rolling_checksum(p) % 64),
                        16 + ((_rolling_checksum(p) >> 8) % 64),
                        max_w,
                        max_h,
                    )
                    for p in payloads
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "out_w": [d[0] for d in dims],
                        "out_h": [d[1] for d in dims],
                        "pixels_mean": payloads.map(
                            lambda p: round(
                                (_rolling_checksum(p) % 25600) / 100.0, 2
                            )
                        ),
                    }
                )
                continue
            resized = payloads.map(real)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": resized.map(lambda d: d[0] if d else None),
                    "out_h": resized.map(lambda d: d[1] if d else None),
                    "pixels_mean": resized.map(
                        lambda d: d[2] if d else None
                    ),
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


BINARY_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _media_from_documents(docs: DataFrame, build_payload) -> DataFrame:
    """Shared scaffold for the closed-form media generators
    (PNG/WAV/EBML): map doc_id → payload bytes through Arrow batches,
    after the small-file cliff guard (the per-row Python encode work
    must not serialize onto a compact file's 1-2 input splits).

    ``build_payload`` must pickle BY VALUE with no repo import on the
    executor. Referencing the module-level encoder globals
    (``encode_png``/``encode_wav``/``encode_ebml``) satisfies this:
    each is a FACTORY CLOSURE whose ``__qualname__``
    (``_png_encode_fn.<locals>.encode``) is not importable as a
    module attribute, so cloudpickle's importability check fails and
    it falls back to by-value serialization — measured, and pinned by
    ``tests/test_ml_streaming_multimodal.py::
    test_media_builders_pickle_by_value``
    (r10 ADVICE: the earlier docstring claimed the closures must not
    touch module globals at all, which these builders do; the actual
    contract is qualname-non-importability, which the factory pattern
    guarantees)."""
    from teleco_etl_pipeline_spark.sources.tables import ensure_min_splits

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "payload": [build_payload(int(m)) for m in mids],
                }
            )

    ids = ensure_min_splits(docs.select("doc_id"), "doc_id")
    return ids.mapInPandas(batches, schema=BINARY_MEDIA_SCHEMA)


RESIZED_EXACT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("n_px", T.LongType(), True),
    ]
)


def png_media_from_documents(docs: DataFrame) -> DataFrame:
    """(media_id, payload) with GENUINE PNG payloads, manufactured
    deterministically from integers alone: greyscale w = 8 + id%16,
    h = 6 + id%12, pixel(y, x) = (id·31 + y·w + x) mod 256, per-row
    filter type y mod 3 (None/Sub/Up — so the decoder's unfilter
    paths run on real data). Because every pixel is a closed-form
    integer, a SQL oracle can recompute any statistic of the decoded
    or resampled raster WITHOUT parsing PNG — that is what makes the
    decode→resize execute path oracle-checkable end-to-end."""

    def build(mid: int) -> bytes:
        w, h = 8 + mid % 16, 6 + mid % 12
        rows = [
            bytes((mid * 31 + y * w + x) % 256 for x in range(w))
            for y in range(h)
        ]
        return encode_png(w, h, rows, nch=1, filt=lambda y: y % 3)

    return _media_from_documents(docs, build)


def resize_png_exact(
    media: DataFrame, max_w: int, max_h: int
) -> DataFrame:
    """REAL decode + NN resample with EXACT-integer outputs
    (media_id, out_w, out_h, px_sum, n_px): the resampled raster's
    pixel sum and count instead of a rounded float mean, so the
    cross-engine hash path has no rounding boundary anywhere.
    Undecodable payloads yield NULL feature columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feat(p):
            return resized_png_sum(p, max_w, max_h)

        for pdf in it:
            out = pdf["payload"].map(feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out.map(lambda d: d[0] if d else None),
                    "out_h": out.map(lambda d: d[1] if d else None),
                    "px_sum": out.map(lambda d: d[2] if d else None),
                    "n_px": out.map(lambda d: d[3] if d else None),
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_EXACT_SCHEMA)


AUDIO_DECIM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("decim_n", T.IntegerType(), True),
        T.StructField("abs_sum", T.LongType(), True),
    ]
)


def wav_media_from_documents(docs: DataFrame) -> DataFrame:
    """(media_id, payload) with GENUINE PCM-16 WAV payloads from
    closed-form integers: 8 kHz mono, n = 64 + id%128 samples,
    sample(i) = ((id·37 + i·11) mod 2048) − 1024 — so a SQL oracle
    can recompute any statistic of the decoded or decimated signal
    WITHOUT parsing RIFF (the audio twin of
    :func:`png_media_from_documents`)."""

    def build(mid: int) -> bytes:
        n = 64 + mid % 128
        return encode_wav(
            8000,
            [((mid * 37 + i * 11) % 2048) - 1024 for i in range(n)],
        )

    return _media_from_documents(docs, build)


def decimate_wav_exact(media: DataFrame, out_n: int = 32) -> DataFrame:
    """REAL audio decode + nearest-sample decimation with EXACT
    integer outputs (media_id, sample_rate, n_samples, decim_n,
    abs_sum): the downsampled signal's absolute-amplitude sum over
    the same NN index map the image resampler uses — the
    frame-sample operation for audio (waveform thumbnails, VAD
    pre-screens). Undecodable payloads yield NULL feature columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feat(p):
            d = wav_pcm(p)
            if d is None:
                return None
            rate, nch, samples = d
            n = len(samples) // nch
            if n == 0:
                return (rate, 0, 0, 0)
            k = min(out_n, n)
            # channel 0 of frame (i·n)//k — the NN map
            total = sum(
                abs(samples[((i * n) // k) * nch]) for i in range(k)
            )
            return (rate, n, k, total)

        for pdf in it:
            out = pdf["payload"].map(feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": out.map(lambda d: d[0] if d else None),
                    "n_samples": out.map(lambda d: d[1] if d else None),
                    "decim_n": out.map(lambda d: d[2] if d else None),
                    "abs_sum": out.map(lambda d: d[3] if d else None),
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_DECIM_SCHEMA)


VIDEO_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("timecode_scale", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
    ]
)


def webm_media_from_documents(docs: DataFrame) -> DataFrame:
    """(media_id, payload) with GENUINE minimal EBML/WebM containers
    from closed-form integers: duration = 500 + (id%5)·1000 ms at
    the default 1 ms timecode scale, 1 + id%3 tracks — the video
    twin of the PNG/WAV generators (structure real, codec payload
    absent by design)."""

    def build(mid: int) -> bytes:
        return encode_ebml(float(500 + (mid % 5) * 1000), 1 + mid % 3)

    return _media_from_documents(docs, build)


def probe_video_batch(media: DataFrame) -> DataFrame:
    """Container-metadata probe over binary video payloads (the
    ffprobe step of a video pipeline): EBML walk → (timecode_scale,
    duration_ms, n_tracks), NULLs for unparseable payloads.
    duration_ms is exact by construction: the Duration float carries
    an integer-valued float64 (< 2^53), so the int cast is lossless
    in every engine."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feat(p):
            d = ebml_probe(p)
            if d is None:
                return None
            scale, dur, tracks = d
            return (scale, int(dur * (scale / 1_000_000.0)), tracks)

        for pdf in it:
            out = pdf["payload"].map(feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "timecode_scale": out.map(lambda d: d[0] if d else None),
                    "duration_ms": out.map(lambda d: d[1] if d else None),
                    "n_tracks": out.map(lambda d: d[2] if d else None),
                }
            )

    return media.mapInPandas(batches, schema=VIDEO_PROBE_SCHEMA)


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

    @query(
        "multimodal_resize_exec",
        """
        WITH m AS (
          SELECT doc_id AS media_id,
                 8 + doc_id % 16 AS w,
                 6 + doc_id % 12 AS h
          FROM documents
        ),
        d AS (
          SELECT media_id, w, h,
                 GREATEST(CASE WHEN w <= 12 AND h <= 9 THEN w
                               WHEN 12 * h <= 9 * w THEN 12
                               ELSE (w * 9) // h END, 1) AS ow,
                 GREATEST(CASE WHEN w <= 12 AND h <= 9 THEN h
                               WHEN 12 * h <= 9 * w THEN (h * 12) // w
                               ELSE 9 END, 1) AS oh
          FROM m
        ),
        gy AS (
          SELECT media_id, w, h, ow, oh, unnest(range(0, oh)) AS y FROM d
        ),
        g AS (
          SELECT media_id, w, h, ow, oh, y, unnest(range(0, ow)) AS x
          FROM gy
        )
        SELECT media_id,
               CAST(ow AS INTEGER) AS out_w,
               CAST(oh AS INTEGER) AS out_h,
               CAST(SUM((media_id * 31 + ((y * h) // oh) * w
                         + ((x * w) // ow)) % 256) AS BIGINT) AS px_sum,
               CAST(ow * oh AS BIGINT) AS n_px
        FROM g
        GROUP BY media_id, ow, oh
        """,
        doc="Image resize EXECUTE path, end-to-end and oracle-backed "
        "(the last declared stub, removed in r10): genuine PNG "
        "payloads are manufactured from closed-form integer pixels "
        "(png_media_from_documents — per-row filters None/Sub/Up so "
        "the unfilter paths run on real data), decoded by the "
        "pure-stdlib RFC 2083 decoder, nearest-neighbor resampled "
        "into a 12x9 fit-within box, and reported as EXACT integer "
        "(px_sum, n_px) of the resized raster — which the DuckDB "
        "oracle recomputes from the same closed forms without "
        "parsing PNG, value-checking encode, inflate, all three "
        "filter decoders, the NN index map, and the fit-within math "
        "in one query. Arrow-batched mapInPandas, bounded memory; at "
        "100 TB the decoder/resampler swaps for a native library "
        "behind the same batch contract.",
    )
    def q_multimodal_resize_exec(spark, sf_dir):
        media = png_media_from_documents(load_table(spark, sf_dir, "documents"))
        return resize_png_exact(media, max_w=12, max_h=9)

    @query(
        "multimodal_audio_decimate",
        """
        WITH m AS (
          SELECT doc_id AS media_id, 64 + doc_id % 128 AS n
          FROM documents
        ),
        g AS (
          SELECT media_id, n, unnest(range(0, 32)) AS i FROM m
        )
        SELECT media_id,
               CAST(8000 AS INTEGER) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(32 AS INTEGER) AS decim_n,
               CAST(SUM(ABS((media_id * 37 + ((i * n) // 32) * 11) % 2048
                            - 1024)) AS BIGINT) AS abs_sum
        FROM g
        GROUP BY media_id, n
        """,
        doc="Audio decode EXECUTE path, end-to-end and oracle-backed "
        "(the audio twin of multimodal_resize_exec): genuine PCM-16 "
        "RIFF/WAVE payloads are manufactured from closed-form "
        "integer samples (wav_media_from_documents), decoded by the "
        "pure-stdlib chunk-walking parser, nearest-sample DECIMATED "
        "to 32 points (the frame-sample operation for audio — "
        "waveform thumbnails / VAD pre-screens), and reported as "
        "EXACT integer (n_samples, decim_n, abs_sum) — which the "
        "DuckDB oracle recomputes from the same closed forms without "
        "parsing RIFF, value-checking encode, chunk walk, PCM "
        "unpack, the NN index map, and the amplitude fold in one "
        "query. Arrow-batched mapInPandas; at 100 TB the parser "
        "swaps for a native codec behind the same batch contract.",
    )
    def q_multimodal_audio_decimate(spark, sf_dir):
        media = wav_media_from_documents(load_table(spark, sf_dir, "documents"))
        return decimate_wav_exact(media, out_n=32)

    @query(
        "multimodal_video_probe",
        """
        SELECT doc_id AS media_id,
               CAST(1000000 AS BIGINT) AS timecode_scale,
               CAST(500 + (doc_id % 5) * 1000 AS BIGINT) AS duration_ms,
               CAST(1 + doc_id % 3 AS INTEGER) AS n_tracks
        FROM documents
        """,
        doc="Video CONTAINER metadata probe, end-to-end and "
        "oracle-backed (the ffprobe step — what routes/filters/"
        "samples video at scale): genuine minimal EBML/WebM "
        "containers are manufactured from closed-form integers "
        "(webm_media_from_documents), parsed by the pure-stdlib "
        "RFC 8794 varint walker descending Segment→Info/Tracks "
        "(ebml_probe), and reported as exact integers the oracle "
        "recomputes from the same closed forms without touching "
        "EBML — value-checking the varint writer, the "
        "leading-zero-length reader, master descent, and the "
        "uint/float leaf decodes in one query. Codec FRAME decode "
        "stays declared out of pure-Python scope; with image decode "
        "+ resize, audio decode + decimation, and this container "
        "probe, every modality's Spark-side surface is real.",
    )
    def q_multimodal_video_probe(spark, sf_dir):
        media = webm_media_from_documents(load_table(spark, sf_dir, "documents"))
        return probe_video_batch(media)


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
