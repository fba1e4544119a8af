"""Correction/reprocessing loop (SURVEY.md §3 St2/St3, M3 —
reference dags/Reprocessing.py).

Corrected files land in a fixed_data/ directory; each is re-validated
with the FULL domain rule set (gender/contract/payment/internet,
Reprocessing.py:41-44,74-109), valid rows are upserted into silver
via delete-then-insert (M3, :113-126), rejects are exported with
error_details (:130-137), and gold is re-derived (:194-198).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.catalog import Warehouse
from teleco_etl_pipeline_spark.operators.upsert import delete_then_insert
from teleco_etl_pipeline_spark.plans import medallion, quality
from teleco_etl_pipeline_spark.sources import files as fsrc


def reprocess_fixed_file(
    wh: Warehouse,
    path: str,
    quarantine_dir: str | None = None,
    refresh_gold: bool = True,
    run_date: str | None = None,
) -> dict:
    """One corrected file through the fix loop."""
    spark = wh.spark
    fixed = (
        fsrc.read_excel(spark, path)
        if path.endswith((".xlsx", ".xls"))
        else fsrc.read_csv(spark, path)
    )

    # Full validation incl. domain membership (Reprocessing.py:74-109)
    rules = quality.churn_rules(fixed, check_domains=True)
    good, bad = quality.split_good_bad(fixed, rules)
    report = {
        "file": os.path.basename(path),
        "input": fixed.count(),
        "rejected": bad.count(),
    }
    if report["rejected"] and quarantine_dir:
        out = os.path.join(
            quarantine_dir, f"rejected_{os.path.basename(path)}.csv"
        )
        fsrc.write_quarantine_report(bad, out)
        report["reject_report"] = out

    if report["input"] == report["rejected"]:
        report["status"] = "ALL_REJECTED"
        return report

    # Align to silver schema: keep silver's columns, typed like bronze
    silver = wh.read("silver", "churn_raw")
    fixes = medallion._bronze_projection(good).select(*silver.columns)

    # M3: delete-then-insert keyed on customer_id, atomically visible
    merged = delete_then_insert(silver, fixes, keys=["customer_id"])
    wh.overwrite_safe(merged, "silver", "churn_raw")
    report["upserted"] = report["input"] - report["rejected"]

    if refresh_gold:
        medallion.build_dims(wh)
        # fact rows for fixed customers must be rebuilt: drop + re-add
        dim_c = wh.read("gold", "dim_customer")
        fixed_keys = dim_c.join(
            fixes.select("customer_id"), "customer_id", "left_semi"
        ).select("customer_key")
        if wh.exists("gold", "fact_customer_churn"):
            fact = wh.read("gold", "fact_customer_churn")
            wh.overwrite_safe(
                fact.join(fixed_keys, "customer_key", "left_anti"),
                "gold",
                "fact_customer_churn",
            )
        report["gold_fact_rows"] = medallion.build_fact(wh, run_date)
    report["status"] = "SUCCESS"
    return report


def watch_and_reprocess(
    wh: Warehouse, fixed_dir: str, archive: bool = True, **kw
) -> list[dict]:
    """Batch analogue of the file-arrival sensor (St2): process every
    file currently in fixed_dir. The streaming variant lives in
    streaming/file_stream.py."""
    import datetime as dt

    reports = []
    for path in sorted(
        fsrc.list_ingest_files(fixed_dir, "*.csv")
        + fsrc.list_ingest_files(fixed_dir, "*.xlsx")
    ):
        rep = reprocess_fixed_file(wh, path, **kw)
        if archive and rep.get("status") == "SUCCESS":
            suffix = dt.datetime.now().strftime("%Y%m%d_%H%M%S")
            fsrc.archive_file(path, os.path.join(fixed_dir, "archive"), suffix)
        reports.append(rep)
    return reports
