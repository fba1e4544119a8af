"""Incremental watermark extraction (SURVEY.md §3.2, St1/J1/J9/P13 —
reference dags/churn_export_dag_cloude.py:323-372,378-596).

The reference extracts from an operational OLTP Postgres (3-table
join + correlated billing subquery) into CSV, advancing a scalar
watermark only after the sink write succeeds; empty windows skip and
do NOT advance. Here the OLTP source is any set of DataFrames
(JDBC-read in production, Parquet in tests) and the same
exactly-once-ish contract is kept via WatermarkStore.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.catalog import Warehouse
from teleco_etl_pipeline_spark.sources.files import write_csv
from teleco_etl_pipeline_spark.sources.state import WatermarkStore

WATERMARK_NAME = "churn_export_last_processed"


def build_incremental_query(
    users: DataFrame,
    personalization: DataFrame,
    billing: DataFrame,
    low: str,
    high: str,
) -> DataFrame:
    """The INCREMENTAL_SQL projection re-expressed declaratively
    (churn_export_dag_cloude.py:323-372):

    - J1 left join User ← UserPersonalization
    - J9 correlated billing SUM decorrelated to pre-agg + left join
    - P13 half-open watermark window on GREATEST(createdAt, updatedAt)
    - P3/P4/P8 conditional/default/literal projections
    - tenure = whole calendar months since createdAt
    """
    u = users.alias("u")
    p = personalization.alias("p")
    spend = (
        billing.groupBy("userId")
        .agg(F.sum("amount").alias("total_charges_raw"))
        .alias("bh")
    )
    yn = lambda c: F.when(F.col(c) == True, "Yes").otherwise("No")  # noqa: E712,E731

    changed_at = F.greatest(F.col("u.createdAt"), F.col("u.updatedAt"))
    lo = F.lit(low).cast("timestamp")
    hi = F.lit(high).cast("timestamp")

    return (
        u.join(p, F.col("p.userId") == F.col("u.id"), "left")
        .join(spend, F.col("bh.userId") == F.col("u.id"), "left")
        .filter((changed_at > lo) & (changed_at <= hi))
        .select(
            F.col("u.id").alias("customer_id"),
            F.coalesce(F.col("u.gender"), F.lit("Unknown")).alias("gender"),
            F.lit("No").alias("senior_citizen"),
            F.coalesce(F.col("p.partner"), F.lit("No")).alias("partner"),
            yn("p.dependents").alias("dependents"),
            F.lit("Egypt").alias("country"),
            F.coalesce(F.col("u.region"), F.lit("Unknown")).alias("state"),
            F.coalesce(F.col("u.region"), F.lit("Unknown")).alias("city"),
            F.lit(30753).alias("zip_code"),
            F.lit(30.0444).alias("latitude"),
            F.lit(31.2357).alias("longitude"),
            yn("p.phoneService").alias("phone_service"),
            yn("p.multipleLines").alias("multiple_lines"),
            F.coalesce(F.col("p.internetService"), F.lit("No")).alias(
                "internet_service"
            ),
            yn("p.onlineSecurity").alias("online_security"),
            yn("p.onlineBackup").alias("online_backup"),
            yn("p.deviceProtection").alias("device_protection"),
            yn("p.techSupport").alias("tech_support"),
            yn("p.streamingTV").alias("streaming_tv"),
            yn("p.streamingMovies").alias("streaming_movies"),
            yn("p.paperlessBilling").alias("paperless_billing"),
            F.coalesce(F.col("p.paymentMethod"), F.lit("Unknown")).alias(
                "payment_method"
            ),
            F.coalesce(F.col("p.contractType"), F.lit("Month-to-month")).alias(
                "contract"
            ),
            # tenure: EXTRACT(YEAR FROM age())*12 + EXTRACT(MONTH ...)
            # == whole calendar months (functions.scalars.tenure_months)
            F.floor(
                F.months_between(F.current_timestamp(), F.col("u.createdAt"))
            )
            .cast("int")
            .alias("tenure_in_months"),
            F.coalesce(F.col("p.monthlyCharges"), F.lit(0.0)).alias(
                "monthly_charges_amount"
            ),
            F.round(F.coalesce(F.col("total_charges_raw"), F.lit(0.0)), 2).alias(
                "total_charges"
            ),
            F.when(F.col("u.status") == "blocked", "Yes")
            .otherwise("No")
            .alias("churn_label"),
            F.when(F.col("u.status") == "blocked", 1).otherwise(0).alias("churn_value"),
            F.lit("n/a").alias("churn_score"),
            F.lit("n/a").alias("cltv"),
            F.lit("n/a").alias("churn_reason"),
            F.col("u.createdAt").alias("created_at"),
            F.col("u.updatedAt").alias("updated_at"),
            F.when(F.col("u.createdAt") > lo, "new")
            .otherwise("updated")
            .alias("record_type"),
            changed_at.alias("_changed_at"),
        )
        .orderBy("_changed_at")  # O1 export ordering
        .drop("_changed_at")
    )


@dataclass
class ExtractResult:
    status: str  # EXPORTED | SKIPPED_NO_DATA
    rows: int
    new_rows: int
    updated_rows: int
    low: str
    high: str
    out_path: str | None


def run_incremental_export(
    wh: Warehouse,
    users: DataFrame,
    personalization: DataFrame,
    billing: DataFrame,
    high: str,
    out_dir: str,
) -> ExtractResult:
    """St1 contract: read watermark → window query → empty ⇒ skip
    without advancing → else CSV sink → advance watermark ONLY after
    the write succeeded."""
    store = WatermarkStore(wh)
    low = store.get(WATERMARK_NAME)
    df = build_incremental_query(users, personalization, billing, low, high)

    counts = {
        r["record_type"]: r["count"]
        for r in df.groupBy("record_type").count().collect()
    }
    total = sum(counts.values())
    if total == 0:
        return ExtractResult("SKIPPED_NO_DATA", 0, 0, 0, low, high, None)

    fname = f"Churn_Export_{low.replace(':', '-').replace(' ', '_')}__{high.replace(':', '-').replace(' ', '_')}"
    out_path = os.path.join(out_dir, fname)
    write_csv(df, out_path, single_file=True)
    store.advance(WATERMARK_NAME, high)  # only after sink success
    return ExtractResult(
        "EXPORTED",
        total,
        counts.get("new", 0),
        counts.get("updated", 0),
        low,
        high,
        out_path,
    )
