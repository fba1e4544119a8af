"""Stream-stream joins and streaming deduplication.

Two Structured Streaming surfaces the batch catalog can't express:

- ``interval_join``: inner join of two event streams on a key plus a
  time-interval condition (the ad-impression↔click pattern). The
  watermarks + the two-sided time bound are what let Spark EVICT
  join state: without them a stream-stream join buffers both sides
  forever. State kept per side ≈ (watermark delay + interval width)
  of data — constant in stream length, which is the only property
  that matters at 100 TB/day.
- ``dedup_within_watermark``: exactly-once-per-key event dedup with
  bounded state (``dropDuplicatesWithinWatermark``, Spark ≥ 3.5).
  Unlike ``dropDuplicates`` on a stream (state grows without bound),
  keys older than the watermark are evicted; a duplicate arriving
  inside the lateness window is dropped, one arriving after it is a
  correctness-vs-state tradeoff the threshold makes explicit —
  the same contract a Kafka exactly-once sink gives you.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    ts: tuple[str, str],
    within: str = "10 minutes",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Inner join where ``right`` must occur in ``[left_ts,
    left_ts + within]`` for the same key (e.g. a click attributed to
    an impression). Column names must be disjoint across the inputs
    (streams usually are; alias beforehand otherwise).
    """
    lk, rk = key
    lts, rts = ts
    lw = left.withWatermark(lts, lateness)
    rw = right.withWatermark(rts, lateness)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner")


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Drop repeat deliveries of the same key within the lateness
    window, with per-key state evicted once the watermark passes."""
    return stream.withWatermark(ts_col, lateness).dropDuplicatesWithinWatermark(
        list(keys)
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to
    an event stream (the kimball-style lookup every streaming
    pipeline needs before aggregating).

    A static DataFrame on the right of a stream join requires NO
    watermark and keeps NO state: each micro-batch broadcast-joins
    the dimension as of that batch's execution — Spark re-resolves
    the static side's files per batch, so a dimension refreshed in
    place (e.g. the warehouse's `safe_overwrite`) is picked up
    without restarting the query. The explicit ``broadcast`` keeps
    the plan shuffle-free on the stream side regardless of dimension
    statistics, which is the property to preserve at 100 TB/day —
    the event stream never repartitions for a lookup.
    """
    cols = [on] if isinstance(on, str) else list(on)
    return stream.join(F.broadcast(dim), cols, how)
