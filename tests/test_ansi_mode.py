"""Catalog queries must be ANSI-mode-independent.

The driver's correctness harness builds its OWN SparkSession, where
Spark 4 defaults ``spark.sql.ansi.enabled=true``. Round 1's
``scrub_cast`` crashed there (CAST_INVALID_INPUT on 'click'→INT)
because the engine relied on non-ANSI cast-to-NULL. Every garbage-
string cast now uses ``try_cast``; this suite locks that in by
running the cast-sensitive queries with ANSI forced ON (runtime conf,
toggled on the shared session).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry


@pytest.fixture()
def ansi(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


# Queries whose expressions cast possibly-malformed strings.
CAST_SENSITIVE = [
    "scrub_cast",
    "error_rate",
    "events_json_props",
    "conditional_projection",
    "tenure_months_calc",
]


@pytest.mark.parametrize("name", CAST_SENSITIVE)
def test_query_runs_under_ansi(ansi, sf_dir, name):
    q = entry.queries()[name]
    df = q(ansi, sf_dir)
    assert df.count() >= 0  # would raise CAST_INVALID_INPUT before fix


def test_scrub_cast_null_on_garbage_under_ansi(ansi, sf_dir):
    """Odd event_ids feed 'click'/'view' strings into safe_int — they
    must become the -1 default (NULL from try_cast), never an error."""
    df = entry.queries()["scrub_cast"](ansi, sf_dir)
    odd = df.filter("event_id % 2 = 1")
    assert odd.count() > 0
    assert odd.filter("safe_int_or_default <> -1").count() == 0


def test_quality_rules_under_ansi(ansi, tmp_path):
    """The Non-numeric Tenure rule depends on garbage→NULL casts."""
    from teleco_etl_pipeline_spark.plans.quality import annotate, churn_rules

    df = ansi.createDataFrame(
        [("c1", "12", "50.5"), ("c2", "garbage", "x"), ("c3", "-1", "9.9")],
        "customer_id string, tenure_in_months string, monthly_charges_amount string",
    )
    out = annotate(df, churn_rules(df)).collect()
    by_id = {r.customer_id: r.error_details for r in out}
    assert by_id["c1"] is None
    assert "Non-numeric Tenure" in by_id["c2"]
    assert "Negative Tenure" in by_id["c3"]
