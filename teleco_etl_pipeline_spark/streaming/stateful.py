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
