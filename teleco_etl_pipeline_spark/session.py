"""SparkSession factory tuned for the engine.

Scale posture: these settings are chosen for correctness on local[N]
test runs while remaining the *right defaults* on a large cluster:

- AQE on (runtime coalescing of shuffle partitions, skew-join
  splitting, dynamic broadcast-join demotion/promotion) so the same
  declarative plans survive a 1000× scale-up without re-tuning.
- ``spark.sql.shuffle.partitions`` is only a pre-AQE upper bound; AQE
  coalesces small post-shuffle partitions, so a value sized for the
  cluster (cores × 2–4) is safe at any SF.
- Arrow enabled for the few pandas bridges (Excel reports, ML
  fallbacks) — never in the relational hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "teleco-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so tests and
    bench share one code path; on a real cluster pass ``None`` and set
    the master via spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    parts = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- Adaptive execution: the backbone of scale-portability ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- Shuffle sizing (pre-AQE bound) ---
        .config("spark.sql.shuffle.partitions", str(parts))
        # --- Joins: allow shuffled-hash when its size conditions are
        #     met instead of always sort-merging (no sort on either
        #     side; the standard batch-ETL baseline), and let AQE
        #     rewrite a planned sort-merge to shuffled-hash at
        #     runtime when every post-shuffle partition is under
        #     64 MB (default 0 = never). Join RESULTS are identical
        #     either way; measured r13 on the 25-query join slice:
        #     41.2 s -> 33.9 s sum-of-medians (fk_integrity_report
        #     3.98 -> 2.31 s, market_share 2.41 -> 1.85 s). Build
        #     sides stay bounded: the planner's own size conditions
        #     gate the static choice, the 64 MB threshold gates the
        #     AQE rewrite. ---
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m",
        )
        # --- Broadcast: dims in the star schema are tiny; let
        #     Catalyst broadcast them (10 MB default is fine, raise a
        #     bit for the 9-column services dim at high SF) ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Arrow for the pandas bridges only ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- Parquet: vectorized reader on, sane split size so a
        #     100 TB scan parallelizes without tiny-task overhead ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- ANSI off: we rely on NULL-on-bad-cast semantics (the
        #     reference's NULLIF/regex-scrub casts) ---
        .config("spark.sql.ansi.enabled", "false")
        # Quiet timezone semantics: store/compare in UTC everywhere.
        .config("spark.sql.session.timeZone", "UTC")
        # --- Periodic driver GC interval (ContextCleaner trigger):
        #     kept at Spark's default, env-overridable. r13 measured
        #     BOTH failure modes: uncollected checkpoint/shuffle
        #     backlog stalls a later Python-exchange stage inside
        #     induced full GCs (multimodal_resize_exec 39 s after an
        #     18-query graph preamble, 2.9 s after one System.gc()),
        #     but a tight 45s interval injects stop-the-world pauses
        #     into measured work (full-suite sum-of-medians regressed
        #     257 -> 397 s). The resolution lives where the problem
        #     is: bench.py runs one UNTIMED System.gc() per query
        #     (cross-query leakage hygiene, like its clearCache),
        #     and long-lived multi-query services can set
        #     SPARK_GRAFT_PERIODIC_GC to taste. ---
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "30min"),
        )
        # --- Driver heap: in local mode the driver JVM IS every
        #     executor; Spark's 1g default is laptop-sized and a
        #     long bench/parity session (hundreds of queries of
        #     accumulated broadcasts + block-manager state on 32
        #     threads) eventually fails a broadcast build against it
        #     (r11: trade_graph_ppr at bench query ~170). 16g on the
        #     128 GiB box; only effective at session creation, and
        #     extra_conf (scaling harnesses pass 32-48g) overrides. ---
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
