"""Stateful streaming operators: built-in session windows and a
custom applyInPandasWithState accumulator.

The reference has no stateful streaming (SURVEY.md §2.10); these are
the beyond-reference pieces a streaming deployment needs:

- ``session_windows``: Spark's native ``F.session_window`` — the
  same expression works in batch (tested against the lag/cumsum
  sessionization in plans/events.py) and under a watermark in a
  stream, where per-session state is dropped once the watermark
  passes the gap.
- ``running_user_totals``: the custom-stateful-operator escape hatch
  (``applyInPandasWithState``): per-key state carried across
  micro-batches as Arrow-backed tuples, for semantics no built-in
  aggregation expresses (running counters, anomaly flags, CDC
  folding). State is partitioned by key across executors — no
  driver-side accumulation, bounded per-key memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session aggregation via the built-in session_window.

    ``ts_col`` must be a real timestamp; the events table's
    TIMESTAMP_NTZ event time converts with ``ts.cast("timestamp")``
    (same instant under the engine's UTC session).
    Pass ``watermark`` (e.g. "1 hour") when ``events`` is a stream so
    closed sessions finalize and their state is evicted.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_running_totals_fn():
    """Factory-made closure (see operators/multimodal.py): pickled by
    value so executor workers need not import this repo."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return update


_update_running_totals = _update_running_totals_fn()


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user (count, sum)
    emitted every micro-batch. Input needs ``user_id`` and ``value``
    columns; state survives across batches via the checkpointed state
    store."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def _make_running_totals_processor():
    """Build the Spark-4 StatefulProcessor lazily (the class only
    exists on pyspark >= 4.0)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """transformWithState twin of _update_running_totals: typed
        per-key ValueState instead of a raw state tuple, plus
        first-class TTL/timer support if eviction is ever needed."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", RUNNING_TOTALS_STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` variant of running_user_totals
    (Spark 4's successor API): named typed state slots via the
    processor handle, optional per-state TTL, and timer callbacks —
    the recommended target for new custom stateful operators.

    Runtime requirement: the transformWithState Python runner talks
    protobuf to the JVM, so ``google.protobuf`` must be installed
    (ships with ``pyspark[connect]``); the applyInPandasWithState twin
    has no such dependency.
    """
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_running_totals_processor(),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


# --- streaming HLL: the mergeable sketch as streaming state -----------------

STREAMING_HLL_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_nonzero", T.LongType()),
        T.StructField("z_scaled", T.LongType()),
        T.StructField("raw_estimate", T.DoubleType()),
    ]
)
STREAMING_HLL_STATE = T.StructType(
    [T.StructField("regs", T.ArrayType(T.LongType()))]
)


def _make_streaming_hll_fn(m: int, r: int, c: float):
    """Factory closure (pickled by value — executor workers need not
    import this repo): per-key HLL registers carried across
    micro-batches. Register update is the per-bucket MAX fold from
    `operators/sketch.py` — because registers are a MERGEABLE
    summary, the streaming accumulator IS the batch operator's
    partial-aggregate state, updated incrementally with O(m) memory
    per key and never re-reading history. Hash family is the same
    md5(bucket=first 2 hex, tail=next 13 hex) so a streaming register
    set is comparable bit-for-bit with the batch sketch.
    """

    def update(key, pdfs, state):
        import hashlib

        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in pdfs:
            for v in pdf["user_id"]:
                h = hashlib.md5(str(v).encode()).hexdigest()
                b = int(h[:2], 16)
                tail = int(h[2:15], 16)
                rho = r if tail == 0 else 52 - tail.bit_length() + 1
                if rho > regs[b]:
                    regs[b] = rho
        state.update((regs,))
        n_nonzero = sum(1 for x in regs if x)
        z_scaled = sum(1 << (r - x) for x in regs)  # zero regs add 2^r
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_nonzero": [n_nonzero],
                "z_scaled": [z_scaled],
                "raw_estimate": [c / float(z_scaled)],
            }
        )

    return update


def streaming_hll_distinct(stream: DataFrame) -> DataFrame:
    """Per-event-type streaming distinct-user HLL (p=8): emits the
    updated register summary + raw estimate every micro-batch. Input
    needs ``event_type`` and ``user_id`` columns. Exactly-once via
    the checkpointed state store; estimate semantics identical to the
    batch `hll_sketch_estimate` contract (no ln-based small-range
    branch — consumers correct from n_zero = m − n_nonzero)."""
    from teleco_etl_pipeline_spark.operators.sketch import (
        _HLL_C,
        _HLL_M,
        _HLL_R,
    )

    return stream.groupBy("event_type").applyInPandasWithState(
        _make_streaming_hll_fn(_HLL_M, _HLL_R, _HLL_C),
        outputStructType=STREAMING_HLL_OUTPUT,
        stateStructType=STREAMING_HLL_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
