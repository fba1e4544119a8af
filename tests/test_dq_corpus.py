"""The ported 40-check DQ corpus must fully pass after a clean
pipeline run, and catch seeded violations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.catalog import Warehouse
from teleco_etl_pipeline_spark.plans import dq_corpus
from teleco_etl_pipeline_spark.plans.pipeline import run_warehouse
from tests.conftest import write_ingest_csv


@pytest.fixture(scope="module")
def built_wh(tmp_path_factory):
    from teleco_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    tmp = tmp_path_factory.mktemp("dq")
    landing = tmp / "landing"
    landing.mkdir()
    write_ingest_csv(str(landing / "churn.csv"))
    run_warehouse(spark, str(tmp / "wh"), str(landing), run_date="2026-08-13")
    return Warehouse(spark, str(tmp / "wh"))


def test_corpus_green_after_clean_run(built_wh):
    results = dq_corpus.assert_corpus(built_wh)
    # every section ran
    sections = {k.split(".")[0] for k in results}
    assert sections == {
        "metadata", "staging", "bronze", "silver", "gold_dims", "fact", "consistency"
    }
    # gated checks actually evaluated (not all skipped)
    gated = [v for v in results.values() if v["passed"] is not None]
    assert len(gated) >= 15
    assert all(v["passed"] for v in gated)
    # profile checks returned data
    assert results["fact.churn_flag_distribution"]["rows"]
    assert results["consistency.layer_row_summary"]["rows"][1]["layer"] == "Bronze"


def test_corpus_catches_violation(built_wh):
    # seed a duplicate fact row → duplicate_customer_keys + fact dup check fail
    wh = built_wh
    fact = wh.read("gold", "fact_customer_churn")
    corrupted = fact.unionByName(fact.limit(1))
    wh.overwrite_safe(corrupted, "gold", "fact_customer_churn")
    try:
        with pytest.raises(AssertionError, match="duplicate_customer_keys"):
            dq_corpus.assert_corpus(wh, sections=["fact"])
    finally:
        wh.overwrite_safe(
            wh.read("gold", "fact_customer_churn").dropDuplicates(["customer_key"]),
            "gold",
            "fact_customer_churn",
        )
