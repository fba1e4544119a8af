"""events.ts vintage normalization must be session-timezone-
independent (the harness runs a vanilla session whose timezone the
engine cannot assume — ADVICE r4 flagged bare NTZ casts rendering
wall clock through spark.sql.session.timeZone).

Three datagen vintages of events.parquet exist in the wild:
  timestamp[us] (current — read natively as NTZ, no-op fast path),
  timestamp[ns] (legacy — readable only as int64 via nanosAsLong),
  timestamp[us, tz=UTC] (LTZ — must pin to the UTC instant).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from teleco_etl_pipeline_spark.sources.tables import (
    _events_ts_is_nanos,
    load_table,
)

_WALL = dt.datetime(2023, 11, 14, 22, 13, 20, 123456)  # UTC wall clock
_EPOCH_NS = 1_700_000_000_123_456_789


def _write_events(dirpath: str, arr: pa.Array) -> None:
    pq.write_table(
        pa.table({"ts": arr, "user_id": pa.array([1], type=pa.int64())}),
        os.path.join(dirpath, "events.parquet"),
    )


@pytest.fixture()
def hostile_tz(spark):
    """Run the body under a deliberately non-UTC session timezone."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ns_vintage_normalizes_to_utc_ntz(hostile_tz, tmp_path):
    spark = hostile_tz
    _write_events(
        str(tmp_path),
        pa.array([_EPOCH_NS], type=pa.int64()).cast(pa.timestamp("ns")),
    )
    assert _events_ts_is_nanos(str(tmp_path / "events.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert df.collect()[0].ts == _WALL  # us truncation of the ns epoch


def test_ltz_vintage_pins_utc_instant(hostile_tz, tmp_path):
    spark = hostile_tz
    _write_events(
        str(tmp_path), pa.array([_WALL], type=pa.timestamp("us", tz="UTC"))
    )
    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    # Under the old bare cast this would read 17:13 New-York wall time.
    assert df.collect()[0].ts == _WALL


def test_current_vintage_is_noop_ntz(hostile_tz, tmp_path):
    spark = hostile_tz
    _write_events(str(tmp_path), pa.array([_WALL], type=pa.timestamp("us")))
    assert not _events_ts_is_nanos(str(tmp_path / "events.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert df.collect()[0].ts == _WALL


def test_event_sequence_patterns_matches_pure_python(spark, sf_dir):
    """Sequence-pattern counts vs a Python re replay over the same
    totally-ordered (ts, event_id) per-user code strings."""
    import os
    import re as _re
    from collections import defaultdict

    import pytest as _pytest

    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        _pytest.skip("harness testdata absent")
    from teleco_etl_pipeline_spark.plans.events import (
        _SEQ_CODES,
        _SEQ_PATTERNS,
        q_event_sequence_patterns,
    )

    got = {r["pattern"]: r for r in q_event_sequence_patterns(spark, sf_dir).collect()}
    code = dict(_SEQ_CODES)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], code.get(r["event_type"], "?")))
    strings = ["".join(c for _t, _i, c in sorted(v)) for v in seqs.values()]
    for lbl, rx in _SEQ_PATTERNS:
        row = got[lbl]
        want = sum(1 for s in strings if _re.search(rx, s))
        assert row["n_users_matching"] == want
        assert row["n_users"] == len(strings)
        assert row["regex"] == rx
    # clean conversions are a subset of ordered conversions
    assert (
        got["clean_conversion"]["n_users_matching"]
        <= got["signup_then_purchase"]["n_users_matching"]
    )


def test_r11_temporal_reports_timezone_independent(spark, sf_dir):
    """The burst / dispersion / Markov reports project event time
    exclusively through epoch_us (NTZ interval arithmetic), so their
    values must be BIT-identical under any session timezone — the
    driver harness never sets one."""
    from teleco_etl_pipeline_spark.plans.registry import all_queries

    names = [
        "events_burst_report",
        "events_arrival_dispersion",
        "events_markov_stationary",
    ]
    qs = all_queries()
    baseline = {n: qs[n].build(spark, sf_dir).collect() for n in names}
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
    try:
        for n in names:
            assert qs[n].build(spark, sf_dir).collect() == baseline[n], n
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
