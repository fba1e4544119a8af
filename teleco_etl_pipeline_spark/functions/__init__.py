"""Scalar-function surface of the engine (SURVEY.md §2.9, §2.2).

Everything here is built from ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen friendly, zero Python UDFs — so Catalyst can fold
constants, push predicates, and prune columns through all of it.
"""

from teleco_etl_pipeline_spark.functions.scalars import (
    epoch_us,
    normalize_columns,
    ntz_lit,
    safe_int,
    scrub_numeric,
    tenure_months,
    error_details,
)

__all__ = [
    "epoch_us",
    "normalize_columns",
    "ntz_lit",
    "safe_int",
    "scrub_numeric",
    "tenure_months",
    "error_details",
]
