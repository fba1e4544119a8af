"""Dump .explain("formatted") for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> <sf_dir> <query> [...]
The optimization-round evidence artifact (guide §1: capture the plan
shape — Exchange count, join strategy, PushedFilters/ReadSchema,
codegen spans, Python-eval nodes — before and after every change).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from teleco_etl_pipeline_spark.plans.registry import all_queries
from teleco_etl_pipeline_spark.session import get_spark


def main() -> int:
    tag, suffix, sf_dir, *names = sys.argv[1:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        df = registry[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
