"""End-to-end warehouse driver (SURVEY.md §3.1: the
Data_Warehouse_Full_Pipeline DAG as a plain Python orchestration of
lazy DataFrame stages with value-check gates).

Stages (mirrors dags/DataWarehouse.py:879 task order):
  ingest CSVs → staging (validate/quarantine/dedup)
  → bronze upsert → bronze DQ gate
  → silver load → silver clean (circuit breaker)
  → gold dims + fact → gold DQ gate
  → archive + metadata bookkeeping

Returns a run-report dict (C7/C8 analogue) with per-stage counts.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.catalog import Warehouse
from teleco_etl_pipeline_spark.plans import medallion, quality
from teleco_etl_pipeline_spark.sources import files as fsrc
from teleco_etl_pipeline_spark.sources.state import FileRegistry


def run_warehouse(
    spark: SparkSession,
    warehouse_root: str,
    staging_dir: str,
    run_id: str | None = None,
    run_date: str | None = None,
    archive: bool = True,
) -> dict:
    """One full daily run. Idempotent: re-running with the same input
    files is a no-op (file checksum skip + keyed upserts + NOT-EXISTS
    fact guard)."""
    wh = Warehouse(spark, warehouse_root)
    registry = FileRegistry(wh)
    run_id = run_id or dt.datetime.now().strftime("run_%Y%m%d_%H%M%S")
    report: dict = {"run_id": run_id, "files": []}

    # --- file registration + checksum skip (C5) ---
    todo: list[str] = []
    for path in fsrc.list_ingest_files(staging_dir):
        name = os.path.basename(path)
        checksum = fsrc.md5_file(path)
        if registry.should_skip(name, checksum):
            report["files"].append({"file": name, "status": "SKIPPED"})
            continue
        registry.upsert(
            [
                {
                    "file_name": name,
                    "file_path": path,
                    "file_size_bytes": os.path.getsize(path),
                    "status": "PROCESSING",
                    "run_id": run_id,
                    "checksum_md5": checksum,
                }
            ]
        )
        todo.append(path)

    if not todo:
        report["status"] = "SKIPPED_NO_NEW_DATA"  # C4 skip semantics
        return report

    try:
        raw = (
            fsrc.read_csv_dir(spark, staging_dir)
            .filter(
                F.col("source_file").isin([os.path.basename(p) for p in todo])
            )
            .drop("source_file")
        )
        report["staging"] = medallion.load_staging(wh, raw)
        report["bronze"] = medallion.bronze_upsert(wh)
        quality.assert_checks_pass(wh.read("bronze", "churn_raw"))  # C2 gate
        report["silver_rows"] = medallion.silver_load(wh)
        report["silver_clean"] = medallion.silver_clean(wh)
        report["gold_dims"] = medallion.build_dims(wh)
        report["gold_fact_rows"] = medallion.build_fact(wh, run_date)
        report["gold_gate"] = medallion.gold_quality_gate(wh)
    except Exception as e:  # noqa: BLE001
        for p in todo:
            registry.set_status(os.path.basename(p), "FAILED", str(e)[:500])
        raise

    # --- archive + final metadata (S13, M7) ---
    suffix = dt.datetime.now().strftime("%Y%m%d_%H%M%S")
    archive_dir = os.path.join(staging_dir, "archive")
    for p in todo:
        name = os.path.basename(p)
        registry.set_status(name, "SUCCESS")
        if archive:
            fsrc.archive_file(p, archive_dir, suffix)
            registry.set_status(name, "ARCHIVED")
            report["files"].append({"file": name, "status": "ARCHIVED"})
        else:
            report["files"].append({"file": name, "status": "SUCCESS"})
    report["status"] = "SUCCESS"
    return report
