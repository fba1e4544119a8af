"""End-to-end medallion pipeline tests over synthetic churn files:
quarantine split, bronze upsert subset, silver defaults, gold star
schema, idempotency, reprocessing, and the quality gates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.catalog import Warehouse
from teleco_etl_pipeline_spark.plans import medallion, quality
from teleco_etl_pipeline_spark.plans.pipeline import run_warehouse
from teleco_etl_pipeline_spark.plans.reprocess import reprocess_fixed_file
from tests.conftest import CSV_HEADER, _row, write_ingest_csv


@pytest.fixture()
def staged(tmp_path, spark):
    staging_dir = tmp_path / "landing"
    staging_dir.mkdir()
    counts = write_ingest_csv(str(staging_dir / "churn_day1.csv"))
    wh_root = str(tmp_path / "warehouse")
    return spark, str(staging_dir), wh_root, counts


def test_full_pipeline_run(staged):
    spark, staging_dir, wh_root, counts = staged
    report = run_warehouse(spark, wh_root, staging_dir, run_date="2026-08-13")
    assert report["status"] == "SUCCESS"
    # 6 dirty rows rejected (missing id, neg tenure, bad tenure, neg
    # charges, bad gender, dup pair counts as 2)
    assert report["staging"]["rejected"] == counts["dirty"]
    assert report["staging"]["staged"] == counts["clean"]
    assert report["bronze"] == {"inserted": 10, "updated": 0, "existing": 0}
    assert report["silver_rows"] == 10
    assert report["gold_fact_rows"] == 10

    wh = Warehouse(spark, wh_root)
    fact = wh.read("gold", "fact_customer_churn")
    # every fact row resolves all dim keys (incl. null-safe services)
    assert fact.filter(F.col("service_key").isNull()).count() == 0
    assert fact.filter(F.col("contract_key").isNull()).count() == 0
    # churn flag derivation
    assert fact.filter(F.col("churn_flag") == "1").count() == 4  # i%3==0 of 10
    # contract normalization reached the dim
    dim_ct = wh.read("gold", "dim_contract")
    assert dim_ct.filter(F.col("contract_type") == "Month-to-Month").count() == 1
    # file archived + metadata terminal
    assert report["files"][0]["status"] == "ARCHIVED"
    assert os.path.exists(os.path.join(staging_dir, "archive"))


def test_pipeline_idempotent_rerun(staged):
    spark, staging_dir, wh_root, _ = staged
    run_warehouse(spark, wh_root, staging_dir, run_date="2026-08-13", archive=False)
    report2 = run_warehouse(
        spark, wh_root, staging_dir, run_date="2026-08-14", archive=False
    )
    # same files, same checksums → skipped entirely (C5)
    assert report2["status"] == "SKIPPED_NO_NEW_DATA"

    wh = Warehouse(spark, wh_root)
    assert wh.read("gold", "fact_customer_churn").count() == 10
    assert (
        wh.read("gold", "fact_customer_churn")
        .groupBy("customer_key")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )


def test_bronze_upsert_column_subset(staged, tmp_path):
    """Day-2 file updates tenure for one customer; country must keep
    its old value (not in the ON CONFLICT subset) while tenure
    updates."""
    spark, staging_dir, wh_root, _ = staged
    run_warehouse(spark, wh_root, staging_dir, run_date="2026-08-13")

    day2 = os.path.join(staging_dir, "churn_day2.csv")
    with open(day2, "w") as f:
        f.write(CSV_HEADER + "\n")
        row = _row("1000-CLEAN0", tenure="99").replace("United States", "Canada")
        f.write(row + "\n")
    report = run_warehouse(spark, wh_root, staging_dir, run_date="2026-08-14")
    # anti-dedup M6 drops rows already in bronze… but only identical
    # keys; CLEAN0 exists → dropped from staging, so bronze unchanged
    assert report["staging"]["dup_vs_bronze"] == 1

    wh = Warehouse(spark, wh_root)
    row = wh.read("bronze", "churn_raw").filter(
        F.col("customer_id") == "1000-CLEAN0"
    ).collect()[0]
    assert row["tenure_in_months"] == 12  # unchanged: dedup preceded upsert
    assert row["country"] == "United States"


def test_bronze_direct_upsert_updates_subset(spark, tmp_path):
    """Drive bronze_upsert directly (no M6 dedup) to verify the ON
    CONFLICT column subset."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    import pandas as pd

    def stage(rows):
        header = [c.strip() for c in CSV_HEADER.split(",")]
        import io

        pdf = pd.read_csv(
            io.StringIO("\n".join([CSV_HEADER] + rows)), dtype=str
        )
        from teleco_etl_pipeline_spark.functions.scalars import normalize_columns

        df = normalize_columns(spark.createDataFrame(pdf.where(pdf.notna())))
        wh.write(df, "staging", "staging_churn")
        assert header  # silence lint

    stage([_row("A-1", tenure="10"), _row("A-2")])
    medallion.bronze_upsert(wh)
    stage([_row("A-1", tenure="99").replace("United States", "Canada")])
    stats = medallion.bronze_upsert(wh)
    assert stats == {"inserted": 0, "updated": 1, "existing": 1}

    row = wh.read("bronze", "churn_raw").filter(F.col("customer_id") == "A-1").collect()[0]
    assert row["tenure_in_months"] == 99  # updated (in subset)
    assert row["country"] == "United States"  # kept (NOT in subset)
    assert row["record_type"] == "updated"
    keep = wh.read("bronze", "churn_raw").filter(F.col("customer_id") == "A-2").collect()[0]
    assert keep["record_type"] == "upserted"


def test_silver_defaults_and_gold_scrub(staged):
    spark, staging_dir, wh_root, _ = staged
    run_warehouse(spark, wh_root, staging_dir, run_date="2026-08-13")
    wh = Warehouse(spark, wh_root)
    silver = wh.read("silver", "churn_raw")
    # churn_reason NULL → 'n/a' (silver SQL :75)
    assert silver.filter(F.col("churn_reason").isNull()).count() == 0
    assert silver.filter(F.col("churn_reason") == "n/a").count() == 6

    fact = wh.read("gold", "fact_customer_churn")
    # churn_score '86' scrubbed to decimal; cltv int
    r = fact.select(F.min("churn_score"), F.max("cltv")).collect()[0]
    assert float(r[0]) == 86.0 and r[1] == 3239


def test_circuit_breaker_trips(spark, tmp_path):
    rows = [_row(f"OK-{i}") for i in range(5)] + [
        _row(f"BAD-{i}", tenure="-1") for i in range(5)
    ]
    import io

    import pandas as pd

    pdf = pd.read_csv(io.StringIO("\n".join([CSV_HEADER] + rows)), dtype=str)
    from teleco_etl_pipeline_spark.functions.scalars import normalize_columns

    df = normalize_columns(spark.createDataFrame(pdf.where(pdf.notna())))
    rules = quality.churn_rules(df)
    with pytest.raises(quality.CircuitBreakerTripped):
        quality.check_circuit_breaker(df, rules)  # 50% > 10%


def test_reprocess_fixed_file(staged, tmp_path):
    spark, staging_dir, wh_root, _ = staged
    run_warehouse(spark, wh_root, staging_dir, run_date="2026-08-13")
    wh = Warehouse(spark, wh_root)

    fixed_dir = tmp_path / "fixed_data"
    fixed_dir.mkdir()
    fix_path = str(fixed_dir / "churn_99_fixed.csv")
    with open(fix_path, "w") as f:
        f.write(CSV_HEADER + "\n")
        f.write(_row("1000-CLEAN1", tenure="77", churn="Yes", churn_value="1") + "\n")
        f.write(_row("2003-BADGEN", gender="Martian") + "\n")  # still invalid

    report = reprocess_fixed_file(
        wh, fix_path, quarantine_dir=str(tmp_path / "q"), run_date="2026-08-14"
    )
    assert report["status"] == "SUCCESS"
    assert report["upserted"] == 1 and report["rejected"] == 1

    silver = wh.read("silver", "churn_raw")
    assert silver.filter(F.col("customer_id") == "1000-CLEAN1").collect()[0][
        "tenure_in_months"
    ] == 77
    # gold fact rebuilt for the fixed customer
    fact = wh.read("gold", "fact_customer_churn")
    dim_c = wh.read("gold", "dim_customer")
    k = dim_c.filter(F.col("customer_id") == "1000-CLEAN1").collect()[0]["customer_key"]
    assert fact.filter(F.col("customer_key") == k).collect()[0]["tenure_months"] == 77


def test_gold_quality_gate_catches_orphans(staged):
    spark, staging_dir, wh_root, _ = staged
    run_warehouse(spark, wh_root, staging_dir, run_date="2026-08-13")
    wh = Warehouse(spark, wh_root)
    # corrupt: drop dim rows → orphans
    dim = wh.read("gold", "dim_customer").limit(2)
    wh.overwrite_safe(dim, "gold", "dim_customer")
    with pytest.raises(AssertionError, match="orphan"):
        medallion.gold_quality_gate(wh)


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Two tables co-bucketed on the join key: sort-merge join plan
    must contain zero Exchange (bucketing provides the partitioning)
    and zero Sort (sortBy provides the ordering)."""
    from teleco_etl_pipeline_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    left = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "a", F.col("k") * 2
    )
    right = spark.range(0, 500).withColumnRenamed("id", "k").withColumn(
        "b", F.col("k") + 1
    )
    wh.write_bucketed(left, "silver", "t_left", ["k"], n_buckets=8, sorted_by=["k"])
    wh.write_bucketed(right, "silver", "t_right", ["k"], n_buckets=8, sorted_by=["k"])

    l, r = wh.read_bucketed("silver", "t_left"), wh.read_bucketed("silver", "t_right")
    joined = l.hint("merge").join(r, "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 500

    # control: the same data read as plain parquet DOES shuffle
    plain = (
        spark.read.parquet(wh.path("silver", "t_left__bucketed"))
        .hint("merge")
        .join(spark.read.parquet(wh.path("silver", "t_right__bucketed")), "k")
    )
    assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()


def test_split_write_observed_matches_error_rate(spark, tmp_path):
    """The observe-piggybacked metrics must equal the dedicated
    aggregate pass, and the good-rows parquet must hold exactly the
    clean subset — all from ONE write action."""
    import io

    import pandas as pd

    rows = [_row(f"OK-{i}") for i in range(8)] + [
        _row(f"BAD-{i}", tenure="-1") for i in range(2)
    ]
    pdf = pd.read_csv(io.StringIO("\n".join([CSV_HEADER] + rows)), dtype=str)
    from teleco_etl_pipeline_spark.functions.scalars import normalize_columns

    df = normalize_columns(spark.createDataFrame(pdf.where(pdf.notna())))
    rules = quality.churn_rules(df)
    out = str(tmp_path / "good.parquet")
    total, bad, pct = quality.split_write_observed(
        df, rules, lambda good: good.write.parquet(out)
    )
    assert (total, bad) == (10, 2) and abs(pct - 20.0) < 1e-9
    assert quality.error_rate(df, rules) == (total, bad, pct)
    good = spark.read.parquet(out)
    assert good.count() == 8 and "error_details" not in good.columns
