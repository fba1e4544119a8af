"""Table maintenance: small-file compaction and sort-based layout.

Two operations every long-lived Parquet warehouse needs and the
reference never had to think about (Postgres heaps don't fragment
this way — but incremental Spark appends do):

- ``compact``: incremental loads (the medallion upserts, streaming
  ``foreachBatch`` sinks, daily partition overwrites) accrete small
  files; scan cost and NameNode/listing pressure grow with file
  COUNT, not bytes. Compaction rewrites a table to ~target-sized
  files. At 100 TB you compact per partition (pass the partition's
  path), never the whole table in one job.
- ``cluster_by``: range-repartition + in-partition sort on chosen
  keys before writing, so each output file covers a narrow key
  range. Parquet row-group min/max stats then let ANY engine skip
  files/row-groups on those keys (poor man's Z-order for the
  single-dimension case — the dominant filter column, e.g. event
  time or customer id).

Both build on ``safe_overwrite`` for the crash-safe swap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from teleco_etl_pipeline_spark.operators.upsert import safe_overwrite

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_bytes(spark: SparkSession, path: str) -> int:
    """On-disk size of a table directory via the Hadoop FileSystem
    API (works for file://, hdfs://, s3a:// alike — no driver-side
    os.walk that would break off the local filesystem)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files: int = 1,
) -> int:
    """Rewrite the Parquet table at ``path`` into
    ``ceil(bytes / target_file_bytes)`` files (at least ``min_files``).
    Returns the file count written.

    The partition count is derived from the CURRENT on-disk bytes, so
    compaction is idempotent: re-running on an already-compact table
    rewrites it into the same number of files. Uses coalesce-free
    ``repartition`` (round-robin) — a coalesce(1) on a big partition
    would funnel the write through few tasks and skew file sizes.
    """
    nbytes = table_bytes(spark, path)
    n_files = max(min_files, -(-nbytes // target_file_bytes))
    df = spark.read.parquet(path).repartition(n_files)
    safe_overwrite(df, path)
    return n_files


def cluster_by(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files: int = 1,
) -> int:
    """Rewrite the table range-partitioned + sorted on ``keys`` so
    each file holds a contiguous, non-overlapping key range and
    row-group min/max statistics become selective. Returns the file
    count. Combine with ``compact`` semantics (same sizing rule);
    filters on ``keys`` afterwards skip whole files at plan time.
    """
    nbytes = table_bytes(spark, path)
    n_files = max(min_files, -(-nbytes // target_file_bytes))
    cols = list(keys)
    df = (
        spark.read.parquet(path)
        .repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
    )
    safe_overwrite(df, path)
    return n_files


def zorder_by(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    bits: int = 10,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files: int = 1,
) -> int:
    """Multi-dimensional clustering: rewrite the table ordered by the
    Morton (Z-order) interleaving of ``keys``, so row-group min/max
    stats are selective on EVERY key at once — ``cluster_by`` makes
    the FIRST key prunable and leaves the rest full-range per file,
    which is why single-key sorting can't serve two filter columns.

    Each key is first mapped to a ``bits``-bit equal-width bucket
    between its table min/max (scalar subqueries — plan-time, no
    driver job), then the bucket bits are interleaved into one long
    z-value used for range partitioning + in-partition sort. Pure
    column expressions (shift/or), whole-stage codegen'd, one range
    shuffle — the same cost as ``cluster_by``. Equal-width bucketing
    assumes roughly uniform keys; heavily skewed keys should be
    pre-transformed (e.g. log) or the skewed dimension left to
    partition pruning instead.
    """
    from pyspark.sql import functions as F

    if bits * len(keys) > 63:
        # JVM shiftleft wraps the shift amount mod 64 — positions ≥64
        # would silently alias onto low bits and scramble the Morton
        # order (layout "succeeds" but prunes nothing).
        raise ValueError(
            f"bits({bits}) * len(keys)({len(keys)}) must be <= 63 to fit "
            "one long z-value; lower bits or split the key set"
        )
    nbytes = table_bytes(spark, path)
    n_files = max(min_files, -(-nbytes // target_file_bytes))
    df = spark.read.parquet(path)
    n_buckets = 1 << bits
    # ALL key bounds from one aggregation job (2×|keys| separate
    # scalar subqueries would each rescan the table — the winsorize
    # lesson, plans/analytics.py).
    bounds = df.agg(
        *[F.min(k).cast("double").alias(f"mn_{k}") for k in keys],
        *[F.max(k).cast("double").alias(f"mx_{k}") for k in keys],
    ).first()
    bucket_cols = []
    for k in keys:
        mn, mx = F.lit(bounds[f"mn_{k}"]), F.lit(bounds[f"mx_{k}"])
        frac = (F.col(k).cast("double") - mn) / (mx - mn + F.lit(1e-12))
        bucket_cols.append(
            F.least(
                F.floor(frac * n_buckets).cast("long"), F.lit(n_buckets - 1)
            )
        )
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for dim, b in enumerate(bucket_cols):
            pos = bit * len(bucket_cols) + dim
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, bit).bitwiseAND(F.lit(1)), pos)
            )
    clustered = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    safe_overwrite(clustered, path)
    return n_files
