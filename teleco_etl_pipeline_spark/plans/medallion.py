"""Medallion pipeline stages: staging → bronze → silver → gold
(SURVEY.md §3.1, reference dags/DataWarehouse.py + SQL layer scripts).

Every stage is a pure DataFrame program over Parquet layer tables:

- **staging**: distributed CSV scan + header normalization + DQ
  split/quarantine + anti-dedup vs bronze (M6).
- **bronze**: keyed upsert (M1) with the reference's exact
  column-subset-on-conflict semantics
  (dags/SQL/Bronze/insert_data_into_bronze.sql:60-77).
- **silver**: full-refresh typed projection with churn_reason
  defaulting (dags/SQL/Silver/insert_data_into_silver.sql:6-76).
- **gold**: 5 idempotent dims (DISTINCT + anti-join + dense surrogate
  keys) and the fact build with normalized-expression joins, the
  9-key null-safe services join, regex-scrub casts, and the
  NOT-EXISTS idempotency guard
  (dags/SQL/Gold/create_load_data_gold.sql:10-145).

Scale posture: dims are broadcast (small by construction — distinct
values of ≤9 string columns); the fact build is one shuffle of
silver on customer_id; bronze upsert shuffles on the business key —
at 100 TB, bucket bronze+staging by customer_id to make it
shuffle-free, and partition the fact by run_date for pruning.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.catalog import SERVICE_COLS, STAGING_SCHEMA, Warehouse
from teleco_etl_pipeline_spark.functions.scalars import safe_int, scrub_numeric
from teleco_etl_pipeline_spark.operators.keys import add_surrogate_key
from teleco_etl_pipeline_spark.operators.upsert import anti_dedup, merge_upsert
from teleco_etl_pipeline_spark.plans import quality

BUSINESS_COLS = [f.name for f in STAGING_SCHEMA.fields]

# ON CONFLICT DO UPDATE column subset — exact parity with
# insert_data_into_bronze.sql:62-77 (country, lat/long doubles,
# service columns, paperless_billing, payment_method, churn_score,
# cltv, churn_reason, created_at keep the OLD value on conflict).
BRONZE_UPDATE_COLS = [
    "gender",
    "senior_citizen",
    "partner",
    "dependents",
    "state",
    "city",
    "zip_code",
    "lat_long",
    "contract",
    "tenure_in_months",
    "monthly_charges_amount",
    "total_charges",
    "churn_label",
    "churn_value",
    "updated_at",
]


# ---------------------------------------------------------------------------
# Staging
# ---------------------------------------------------------------------------


def load_staging(
    wh: Warehouse,
    raw: DataFrame,
    quarantine_table: str = "staging_rejects",
) -> dict[str, int]:
    """Validate + split + quarantine + write staging (truncate-load).

    ``raw`` is the normalized CSV scan (sources.files.read_csv_dir).
    Bad rows go to the quarantine layer with error_details; good rows
    overwrite staging. If bronze exists, rows whose customer_id is
    already present are dropped (M6 dedup-before-insert,
    DataWarehouse.py:655-673).
    """
    present = [c for c in BUSINESS_COLS if c in raw.columns]
    raw = raw.select(*present, *[c for c in raw.columns if c not in BUSINESS_COLS])
    rules = quality.churn_rules(raw)
    # Cache the annotated frame: every downstream action (stats agg,
    # quarantine write, staging write) would otherwise re-run the CSV
    # scan + rule evaluation — round 1 paid that scan four times.
    annotated = quality.annotate(raw, rules).cache()
    good = annotated.filter(F.col("error_details").isNull()).drop("error_details")
    bad = annotated.filter(F.col("error_details").isNotNull())

    # One pass for both counts (the A10 conditional-agg trick).
    row = annotated.agg(
        F.count(F.lit(1)).alias("input"),
        F.coalesce(
            F.sum(F.when(F.col("error_details").isNotNull(), 1)), F.lit(0)
        ).alias("rejected"),
    ).collect()[0]
    stats = {"input": row["input"], "rejected": int(row["rejected"])}
    if stats["rejected"]:
        wh.write(bad, "quarantine", quarantine_table, mode="append")

    if wh.exists("bronze", "churn_raw"):
        bronze = wh.read("bronze", "churn_raw")
        good = anti_dedup(good, bronze, keys=["customer_id"])

    wh.write(good, "staging", "staging_churn")  # S12 truncate-load
    # Count the WRITTEN table: parquet footer metadata, no recompute.
    stats["staged"] = wh.read("staging", "staging_churn").count()
    stats["dup_vs_bronze"] = stats["input"] - stats["rejected"] - stats["staged"]
    annotated.unpersist()
    return stats


# ---------------------------------------------------------------------------
# Bronze
# ---------------------------------------------------------------------------


def _bronze_projection(staging: DataFrame) -> DataFrame:
    """Typed projection staging→bronze shape (P5/P8/P9 + audit cols):
    safe zip cast, lat_long recompute, current timestamps."""
    cols = []
    for c in BUSINESS_COLS:
        if c == "zip_code":
            cols.append(safe_int("zip_code").alias("zip_code"))
        elif c == "lat_long":
            # lat_long recomputed from components (bronze SQL :31)
            cols.append(
                F.concat_ws(
                    ",",
                    F.col("latitude").cast("string"),
                    F.col("longitude").cast("string"),
                ).alias("lat_long")
            )
        elif c in ("latitude", "longitude"):
            cols.append(F.col(c).try_cast("double").alias(c))
        elif c == "tenure_in_months":
            cols.append(F.col(c).try_cast("int").alias(c))
        elif c in ("monthly_charges_amount", "total_charges"):
            cols.append(F.col(c).try_cast("double").alias(c))
        elif c == "churn_value":
            cols.append(F.col(c).try_cast("int").alias(c))
        else:
            cols.append(F.col(c).cast("string").alias(c))
    now = F.current_timestamp()
    return staging.select(
        *cols,
        now.alias("created_at"),
        now.alias("updated_at"),
        F.lit("upserted").alias("record_type"),
    )


def bronze_upsert(wh: Warehouse) -> dict[str, int]:
    """M1: INSERT … ON CONFLICT (customer_id) DO UPDATE subset."""
    src = _bronze_projection(wh.read("staging", "staging_churn"))
    if not wh.exists("bronze", "churn_raw"):
        wh.write(src, "bronze", "churn_raw")
        return {"inserted": src.count(), "updated": 0, "existing": 0}

    target = wh.read("bronze", "churn_raw")
    merged = merge_upsert(
        target,
        src,
        keys=["customer_id"],
        update_cols=BRONZE_UPDATE_COLS,
        record_type_col="_merge_action",
    )
    # record_type bookkeeping: inserts keep the projection's
    # 'upserted'; conflicts become 'updated'; untouched rows keep
    # their previous value (already held in record_type since it is
    # NOT in the update subset).
    merged = merged.withColumn(
        "record_type",
        F.when(F.col("_merge_action") == "updated", F.lit("updated")).otherwise(
            F.col("record_type")
        ),
    )
    stats_row = merged.groupBy("_merge_action").count().collect()
    stats = {r["_merge_action"]: r["count"] for r in stats_row}
    wh.overwrite_safe(merged.drop("_merge_action"), "bronze", "churn_raw")
    return {
        "inserted": stats.get("new", 0),
        "updated": stats.get("updated", 0),
        "existing": stats.get("existing", 0),
    }


# ---------------------------------------------------------------------------
# Silver
# ---------------------------------------------------------------------------


def silver_load(wh: Warehouse) -> int:
    """Full-refresh projection bronze→silver (S12 + P2/P4)."""
    bronze = wh.read("bronze", "churn_raw")
    cols = []
    for c in BUSINESS_COLS:
        if c == "churn_reason":
            cols.append(F.coalesce(F.col(c), F.lit("n/a")).alias(c))
        else:
            cols.append(F.col(c))
    silver = bronze.select(*cols)
    wh.write(silver, "silver", "churn_raw")
    return silver.count()


def silver_clean(wh: Warehouse) -> dict[str, int]:
    """DQ sweep over silver: quarantine bad rows (M4 predicate
    delete), halt on >10% error rate (C3)."""
    silver = wh.read("silver", "churn_raw")
    rules = quality.churn_rules(silver, check_domains=False)
    total, bad_cnt, pct = quality.check_circuit_breaker(silver, rules)
    if bad_cnt:
        good, bad = quality.split_good_bad(silver, rules)
        wh.write(bad, "quarantine", "silver_rejects", mode="append")
        wh.overwrite_safe(good, "silver", "churn_raw")
    return {"total": total, "removed": bad_cnt, "error_rate_pct": round(pct, 4)}


# ---------------------------------------------------------------------------
# Gold
# ---------------------------------------------------------------------------

def _norm_contract():
    return F.replace(
        F.col("contract"), F.lit("Month-to-month"), F.lit("Month-to-Month")
    )


def _idempotent_dim(
    wh: Warehouse,
    table: str,
    key_col: str,
    new_values: DataFrame,
    natural_cols: list[str],
) -> DataFrame:
    """DISTINCT + NOT EXISTS + dense surrogate keys continuing from
    the current max (A8 + J7 + SERIAL semantics)."""
    if wh.exists("gold", table):
        existing = wh.read("gold", table)
        max_key = existing.agg(F.max(key_col)).collect()[0][0] or 0
        fresh = new_values.join(existing, on=natural_cols, how="left_anti")
    else:
        existing = None
        max_key = 0
        fresh = new_values
    keyed = add_surrogate_key(
        fresh.distinct(), key_col, order_by=natural_cols, start_at=max_key + 1
    ).select(key_col, *natural_cols)
    dim = existing.unionByName(keyed) if existing is not None else keyed
    wh.overwrite_safe(dim, "gold", table)
    return wh.read("gold", table)


def build_dims(wh: Warehouse) -> dict[str, int]:
    s = wh.read("silver", "churn_raw")
    counts = {}

    contract = s.filter(F.col("contract").isNotNull()).select(
        _norm_contract().alias("contract_type")
    )
    counts["dim_contract"] = _idempotent_dim(
        wh, "dim_contract", "contract_key", contract, ["contract_type"]
    ).count()

    payment = s.filter(F.col("payment_method").isNotNull()).select("payment_method")
    counts["dim_payment_method"] = _idempotent_dim(
        wh, "dim_payment_method", "payment_method_key", payment, ["payment_method"]
    ).count()

    reason = s.select(
        F.coalesce(F.col("churn_reason"), F.lit("n/a")).alias("churn_reason")
    )
    counts["dim_churn_reason"] = _idempotent_dim(
        wh, "dim_churn_reason", "churn_reason_key", reason, ["churn_reason"]
    ).count()

    customer = s.select(
        "customer_id",
        "gender",
        F.when(F.col("senior_citizen").isin("1", "Yes", "True"), "1")
        .otherwise("0")
        .alias("senior_citizen"),
        "partner",
        "dependents",
        "city",
        "state",
    )
    # NOT EXISTS is on customer_id alone (gold SQL :59-61)
    if wh.exists("gold", "dim_customer"):
        existing = wh.read("gold", "dim_customer")
        max_key = existing.agg(F.max("customer_key")).collect()[0][0] or 0
        fresh = customer.join(
            existing.select("customer_id"), on=["customer_id"], how="left_anti"
        )
        keyed = add_surrogate_key(
            fresh.distinct(), "customer_key", order_by=["customer_id"], start_at=max_key + 1
        )
        dim_customer = existing.unionByName(
            keyed.select("customer_key", *customer.columns)
        )
    else:
        dim_customer = add_surrogate_key(
            customer.distinct(), "customer_key", order_by=["customer_id"]
        ).select("customer_key", *customer.columns)
    wh.overwrite_safe(dim_customer, "gold", "dim_customer")
    counts["dim_customer"] = wh.read("gold", "dim_customer").count()

    services = s.select(*SERVICE_COLS)
    counts["dim_services"] = _null_safe_dim(wh, services).count()
    return counts


def _null_safe_dim(wh: Warehouse, services: DataFrame) -> DataFrame:
    """dim_services: NOT EXISTS over 9 null-safe keys (J4 in the dim
    build too — NULL service rows must form their own dim row)."""
    distinct = services.distinct()
    if wh.exists("gold", "dim_services"):
        existing = wh.read("gold", "dim_services")
        max_key = existing.agg(F.max("service_key")).collect()[0][0] or 0
        cond = None
        for c in SERVICE_COLS:
            clause = distinct[c].eqNullSafe(existing[c])
            cond = clause if cond is None else (cond & clause)
        fresh = distinct.join(existing, on=cond, how="left_anti")
        keyed = add_surrogate_key(
            fresh, "service_key", order_by=SERVICE_COLS, start_at=max_key + 1
        ).select("service_key", *SERVICE_COLS)
        dim = existing.unionByName(keyed)
    else:
        dim = add_surrogate_key(
            distinct, "service_key", order_by=SERVICE_COLS
        ).select("service_key", *SERVICE_COLS)
    wh.overwrite_safe(dim, "gold", "dim_services")
    return wh.read("gold", "dim_services")


def build_fact(
    wh: Warehouse, run_date: str | None = None, zorder: bool = True
) -> int:
    """Fact build (gold SQL :94-145): star joins + scrub casts +
    NOT-EXISTS guard on customer_key.

    The gold fact is written Z-order-clustered on
    (customer_key-bucket, cltv-bucket) by default
    (``Warehouse.write_zordered``): downstream gold consumers filter
    by customer ranges (quality gate, upserts) AND by value bands
    (the ML label/feature scans), and Morton clustering bounds the
    per-file min/max span of BOTH — single-column layout prunes one
    or the other. ``zorder=False`` restores the plain atomic
    overwrite."""
    run_date = run_date or dt.date.today().isoformat()
    s = wh.read("silver", "churn_raw").alias("s")
    c = F.broadcast(wh.read("gold", "dim_customer")).alias("c")
    ct = F.broadcast(wh.read("gold", "dim_contract")).alias("ct")
    pm = F.broadcast(wh.read("gold", "dim_payment_method")).alias("pm")
    cr = F.broadcast(wh.read("gold", "dim_churn_reason")).alias("cr")
    sv = F.broadcast(wh.read("gold", "dim_services")).alias("sv")

    sv_cond = None
    for col in SERVICE_COLS:
        clause = F.col(f"sv.{col}").eqNullSafe(F.col(f"s.{col}"))
        sv_cond = clause if sv_cond is None else (sv_cond & clause)

    fact = (
        s.join(c, F.col("c.customer_id") == F.col("s.customer_id"))
        .join(
            ct,
            F.col("ct.contract_type")
            == F.replace(
                F.col("s.contract"), F.lit("Month-to-month"), F.lit("Month-to-Month")
            ),
            "left",
        )
        .join(pm, F.col("pm.payment_method") == F.col("s.payment_method"), "left")
        .join(
            cr,
            F.trim(F.upper(F.col("cr.churn_reason")))
            == F.trim(F.upper(F.coalesce(F.col("s.churn_reason"), F.lit("n/a")))),
            "left",
        )
        .join(sv, sv_cond, "left")
        .select(
            F.col("c.customer_key"),
            F.col("ct.contract_key"),
            F.col("pm.payment_method_key"),
            F.col("cr.churn_reason_key"),
            F.col("sv.service_key"),
            scrub_numeric(F.col("s.tenure_in_months"), "int").alias("tenure_months"),
            F.col("s.monthly_charges_amount")
            .try_cast("decimal(10,2)")
            .alias("monthly_charges"),
            F.col("s.total_charges").try_cast("decimal(12,2)").alias("total_charges"),
            F.when(
                F.col("s.churn_label").isin("1", "1.0", "Yes", "Y", "True", "true"),
                "1",
            )
            .otherwise("0")
            .alias("churn_flag"),
            scrub_numeric(F.col("s.cltv"), "int").alias("cltv"),
            scrub_numeric(F.col("s.churn_score"), "decimal(5,2)").alias("churn_score"),
            F.lit(run_date).cast("date").alias("run_date"),
        )
    )

    if wh.exists("gold", "fact_customer_churn"):
        existing = wh.read("gold", "fact_customer_churn")
        fact = fact.join(
            existing.select("customer_key"), on=["customer_key"], how="left_anti"
        )
        merged = existing.unionByName(fact)
    else:
        merged = fact
    if zorder:
        wh.write_zordered(
            merged,
            "gold",
            "fact_customer_churn",
            [
                F.pmod(F.col("customer_key"), F.lit(256)).cast("long"),
                F.pmod(F.coalesce(F.col("cltv"), F.lit(0)), F.lit(256)).cast(
                    "long"
                ),
            ],
            n_files=16,
        )
    else:
        wh.overwrite_safe(merged, "gold", "fact_customer_churn")
    return wh.read("gold", "fact_customer_churn").count()


def gold_quality_gate(wh: Warehouse) -> dict[str, int]:
    """dq_gold_fact_check (DataWarehouse.py:841-863): orphan keys,
    negative measures — all must be 0."""
    fact = wh.read("gold", "fact_customer_churn")
    dim_c = wh.read("gold", "dim_customer")
    orphans = fact.join(dim_c.select("customer_key"), "customer_key", "left_anti")
    checks = {
        "orphan_customer_keys": orphans.count(),
        "negative_tenure": fact.filter(F.col("tenure_months") < 0).count(),
        "negative_charges": fact.filter(F.col("monthly_charges") < 0).count(),
    }
    failing = {k: v for k, v in checks.items() if v != 0}
    if failing:
        raise AssertionError(f"gold DQ gate failed: {failing}")
    return checks
