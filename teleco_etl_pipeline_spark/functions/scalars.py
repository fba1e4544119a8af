"""Scalar expression helpers (pure Column → Column, no UDFs).

These reproduce the semantics of the reference's scalar layer —
pandas header normalization, Postgres NULLIF/regex-scrub casts,
``age()``-based tenure, error-annotation concat — as Catalyst
expressions (reference: dags/DataWarehouse.py:616-621,
dags/SQL/Bronze/insert_data_into_bronze.sql:28,
dags/SQL/Gold/create_load_data_gold.sql:106-120,
dags/churn_export_dag_cloude.py:348-351).
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference rename map (dags/DataWarehouse.py:617-621).
DEFAULT_RENAMES: dict[str, str] = {
    "customerid": "customer_id",
    "tenure_months": "tenure_in_months",
    "monthly_charges": "monthly_charges_amount",
}


def _norm_name(name: str) -> str:
    """lower, strip, spaces→underscores (dags/DataWarehouse.py:616)."""
    return re.sub(r"\s+", "_", name.strip().lower())


def normalize_columns(
    df: DataFrame, renames: Mapping[str, str] | None = None
) -> DataFrame:
    """Header normalization by convention + rename map (P1)."""
    renames = dict(DEFAULT_RENAMES if renames is None else renames)
    new_names = []
    for c in df.columns:
        n = _norm_name(c)
        new_names.append(renames.get(n, n))
    return df.toDF(*new_names)


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of an event-time column — the engine's
    canonical cross-engine time projection (== DuckDB ``epoch_us``).

    The harness events table carries ``ts`` as parquet timestamp[us]
    without timezone, which Spark reads as TIMESTAMP_NTZ. Computed as
    pure NTZ interval arithmetic from the NTZ epoch — deliberately
    NOT ``unix_micros(cast(ts as timestamp))``, which routes through
    the session timezone and silently shifts the result when a
    caller-provided session (the driver's) isn't UTC; DuckDB's
    ``epoch_us`` on naive timestamps has no such dependence, and
    neither does this. Projection-only: filters must compare the raw
    column against TIMESTAMP_NTZ literals (see ``ntz_lit``) so they
    still push to the parquet scan.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"), c
    )


def ntz_lit(ts: str) -> Column:
    """TIMESTAMP_NTZ literal from ``'YYYY-MM-DD HH:MM:SS'`` — the
    pushdown-safe comparand for event-time range filters: a plain
    ``ts > TIMESTAMP_NTZ '...'`` reaches the parquet reader as a
    PushedFilter with row-group min/max pruning, while any expression
    over ``ts`` (cast, unix_micros) does not."""
    return F.expr(f"TIMESTAMP_NTZ '{ts}'")


def safe_int(col: Column | str) -> Column:
    """``CAST(NULLIF(TRIM(x::TEXT), '') AS INTEGER)`` (P5).

    ``try_cast`` yields NULL on garbage in BOTH ANSI modes, so the
    expression is session-conf-independent (a plain ``.cast`` throws
    CAST_INVALID_INPUT under Spark 4's ANSI default when the caller's
    session — not ours — runs the plan). The NULLIF keeps the
    empty-string path explicit and oracle-matchable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.trim(c.cast("string")), F.lit("")).try_cast("int")


def scrub_numeric(col: Column | str, target: str = "double") -> Column:
    """Strip non-``[0-9.]`` then cast; empty → NULL (P6).

    Faithful to the reference's digit-concatenation semantics
    (``'12a3'`` → ``123``, ``'n/a'`` → NULL) — see
    dags/SQL/Gold/create_load_data_gold.sql:106,117,120.
    """
    c = F.col(col) if isinstance(col, str) else col
    scrubbed = F.regexp_replace(c.cast("string"), r"[^0-9.]", "")
    # try_cast: scrubbed strings can still be malformed ('1.2.3');
    # NULL-on-garbage must hold even under an ANSI caller session.
    return F.nullif(scrubbed, F.lit("")).try_cast(target)


def tenure_months(start: Column | str, now: Column | str) -> Column:
    """Calendar-month tenure: ``EXTRACT(YEAR FROM age())*12 + EXTRACT
    (MONTH FROM age())`` (dags/churn_export_dag_cloude.py:348-351).

    ``age()`` counts whole calendar months (day-of-month aware);
    ``floor(months_between)`` matches it because months_between also
    uses day-of-month alignment for the integral part.
    """
    s = F.col(start) if isinstance(start, str) else start
    n = F.col(now) if isinstance(now, str) else now
    return F.floor(F.months_between(n, s)).cast("int")


def error_details(rules: Sequence[tuple[Column, str]]) -> Column:
    """Concatenate per-rule reason strings with '; ' (P11).

    ``rules`` is [(bad_predicate, reason), ...]; rows violating no
    rule get NULL (concat_ws over all-NULL yields '' → nullif).
    """
    parts = [F.when(pred, F.lit(reason)) for pred, reason in rules]
    joined = F.concat_ws("; ", *parts)
    return F.nullif(joined, F.lit(""))
