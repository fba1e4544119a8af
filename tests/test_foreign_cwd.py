"""The external harness controls cwd/PYTHONPATH: executor Python
workers inherit the JVM's working directory, NOT the driver's
sys.path, so any Arrow-batch function pickled BY REFERENCE to this
repo's modules unpickles fine in-repo but crashes in the harness.
This test reproduces that environment — a subprocess with cwd=/tmp
and the repo absent from its initial sys.path (injected only on the
driver, exactly like __spark_entry__.py does) — and drives every
Python-path query family end-to-end."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import importlib.util, sys
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
qs = mod.queries()
# One query per Python-executed family: mapInPandas (MG sketch),
# binary mapInPandas, pandas_udf matmul, applyInPandas cluster dedup.
for name in ("heavy_hitter_tokens", "multimodal_features",
             "embedding_lsh_pairs", "embedding_semantic_dedup",
             "embedding_pq_topk", "embedding_knn_classify"):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    print("OK", name, n, flush=True)
print("ALL_OK")
"""


def test_python_path_queries_run_from_foreign_cwd():
    script = _SCRIPT.format(entry=os.path.join(REPO, "__spark_entry__.py"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ALL_OK" in out.stdout, out.stdout[-2000:]
