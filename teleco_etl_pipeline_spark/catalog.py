"""Layer catalog: explicit StructType schemas for every warehouse
table (SURVEY.md §1.2-§1.3) and path management for Parquet layers.

The reference keeps four Postgres schemas (public/staging, bronze,
silver, gold) plus pipeline metadata (dags/DataWarehouse.py:37,
dags/SQL/Bronze/DDL_BronzeTable.sql, dags/SQL/Silver/DDL_Silver_
Table.sql, dags/SQL/Gold/DDL_gold.sql). Here each layer is a
directory of Parquet tables; schemas are code, applied at read/write
boundaries so drift is caught early.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    from teleco_etl_pipeline_spark.formats import TableFormat

# ---------------------------------------------------------------------------
# Business columns (variant-A ingest shape, FIXTURES.md §1; bronze DDL
# dags/SQL/Bronze/DDL_BronzeTable.sql:8-46)
# ---------------------------------------------------------------------------

SERVICE_COLS = [
    "phone_service",
    "multiple_lines",
    "internet_service",
    "online_security",
    "online_backup",
    "device_protection",
    "tech_support",
    "streaming_tv",
    "streaming_movies",
]

_BUSINESS_FIELDS: list[tuple[str, T.DataType]] = [
    ("customer_id", T.StringType()),
    ("gender", T.StringType()),
    ("senior_citizen", T.StringType()),
    ("partner", T.StringType()),
    ("dependents", T.StringType()),
    ("country", T.StringType()),
    ("state", T.StringType()),
    ("city", T.StringType()),
    ("zip_code", T.IntegerType()),
    ("lat_long", T.StringType()),
    ("latitude", T.DoubleType()),
    ("longitude", T.DoubleType()),
    *[(c, T.StringType()) for c in SERVICE_COLS],
    ("paperless_billing", T.StringType()),
    ("payment_method", T.StringType()),
    ("contract", T.StringType()),
    ("tenure_in_months", T.IntegerType()),
    ("monthly_charges_amount", T.DoubleType()),
    ("total_charges", T.DoubleType()),
    ("churn_label", T.StringType()),
    ("churn_value", T.IntegerType()),
    ("churn_score", T.StringType()),  # may hold 'n/a' — scrubbed in gold
    ("cltv", T.StringType()),  # may hold 'n/a'
    ("churn_reason", T.StringType()),
]

BUSINESS_SCHEMA = T.StructType(
    [T.StructField(n, t, True) for n, t in _BUSINESS_FIELDS]
)

# Staging reads everything as string (schema-on-read tolerance,
# DataWarehouse.py:615 pandas inference ~ permissive).
STAGING_SCHEMA = T.StructType(
    [T.StructField(n, T.StringType(), True) for n, _ in _BUSINESS_FIELDS]
)

# Bronze = business cols + audit cols (DDL_BronzeTable.sql:42-44).
BRONZE_SCHEMA = T.StructType(
    list(BUSINESS_SCHEMA.fields)
    + [
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("record_type", T.StringType(), True),
    ]
)

# Silver = cleaned business cols, no audit (DDL_Silver_Table.sql:3-38).
SILVER_SCHEMA = BUSINESS_SCHEMA

META_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType(), False),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("file_size_bytes", T.LongType(), True),
        T.StructField("row_count", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("processed_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("checksum_md5", T.StringType(), True),
    ]
)

WATERMARK_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

LAYERS = ("staging", "bronze", "silver", "gold", "meta", "quarantine")


@dataclass
class Warehouse:
    """Path layout + table IO for one warehouse root directory.

    All storage goes through a pluggable ``TableFormat`` (formats.py):
    the default is plain Parquet; setting
    ``SPARK_GRAFT_TABLE_FORMAT=delta`` (or passing ``fmt=``) switches
    every layer table to an ACID format with native MERGE/DELETE —
    pipeline code is unchanged either way.
    """

    spark: SparkSession
    root: str
    fmt: "TableFormat | None" = None

    def __post_init__(self) -> None:
        if self.fmt is None:
            from teleco_etl_pipeline_spark.formats import get_format

            self.fmt = get_format()

    def path(self, layer: str, table: str) -> str:
        return os.path.join(self.root, layer, table)

    def exists(self, layer: str, table: str) -> bool:
        return os.path.exists(self.path(layer, table))

    def read(self, layer: str, table: str) -> DataFrame:
        return self.fmt.read(self.spark, self.path(layer, table))

    def write(self, df: DataFrame, layer: str, table: str, mode: str = "overwrite") -> None:
        self.fmt.write(df, self.path(layer, table), mode=mode)

    def overwrite_safe(self, df: DataFrame, layer: str, table: str) -> None:
        """Overwrite a table that ``df`` may lazily read from."""
        self.fmt.overwrite_atomic(df, self.path(layer, table))

    def upsert_into(
        self,
        source: DataFrame,
        layer: str,
        table: str,
        keys: list[str],
        update_cols: list[str] | None = None,
    ) -> None:
        """Keyed MERGE into a layer table (M1 semantics). Plain
        Parquet emulates it relationally + swap; Delta runs a native
        transactional MERGE."""
        self.fmt.upsert(
            self.spark, self.path(layer, table), source, keys, update_cols
        )

    def write_zordered(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        zcols: list,
        n_files: int = 16,
        bits: int = 8,
    ) -> None:
        """Overwrite a layer table Z-order-clustered on ``zcols`` —
        the multi-dimensional data-skipping layout
        (``operators/layout.py``): range-partition + sort on the
        Morton key so every output file covers a small hypercube of
        the quantized key space and parquet min/max stats prune
        selective predicates on ANY clustered dimension.

        ``zcols`` are ALREADY-QUANTIZED integer Column expressions
        (e.g. ``pmod(customer_key, 256)``) — the
        :func:`operators.layout.zorder_key` contract. ``n_files``
        sizes output files: pick ~ table size / 128 MB at the target
        SF (the clustering shuffle is the same single exchange a
        plain sorted write would pay). Atomic like
        :meth:`overwrite_safe`."""
        from teleco_etl_pipeline_spark.operators.layout import (
            zorder_repartition,
        )

        clustered = zorder_repartition(df, zcols, n_files, bits)
        self.fmt.overwrite_atomic(clustered, self.path(layer, table))

    # -- bucketed tables: shuffle elimination for repeated key joins --

    def bucketed_name(self, layer: str, table: str) -> str:
        return f"{layer}_{table}"

    def write_bucketed(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 32,
        sorted_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> str:
        """Write a catalog table bucketed (and optionally sorted) by
        the join/merge key. Equi-joins and groupBys between tables
        co-bucketed on the same key then run with ZERO Exchange (and
        zero Sort when ``sorted_by`` matches) — at 100 TB this removes
        the repeated customer_id shuffle from every bronze-upsert /
        silver-clean / gold-fact stage. ``n_buckets`` sizes reducer
        parallelism: pick ~ (table size / 128 MB) at the target SF.
        Returns the catalog table name."""
        name = self.bucketed_name(layer, table)
        writer = (
            df.write.mode(mode)
            .format("parquet")
            .option("path", self.path(layer, table + "__bucketed"))
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sorted_by:
            writer = writer.sortBy(*sorted_by)
        writer.saveAsTable(name)
        return name

    def read_bucketed(self, layer: str, table: str) -> DataFrame:
        """Read a bucketed table THROUGH the catalog (a raw
        ``read.parquet`` of the same path would lose the bucket
        spec and reintroduce shuffles)."""
        return self.spark.table(self.bucketed_name(layer, table))

    # -- versioned snapshots: reproducible dataset releases ----------

    def snapshot_dir(self, layer: str, table: str) -> str:
        return self.path(layer, table) + "__snapshots"

    def list_snapshots(self, layer: str, table: str) -> list[int]:
        """Committed snapshot versions, ascending. A version is
        committed iff its directory carries the format's success
        marker — a half-written snapshot (writer died mid-job) is
        invisible here and harmless on disk."""
        base = self.snapshot_dir(layer, table)
        if not os.path.isdir(base):
            return []
        out = []
        for d in os.listdir(base):
            if d.startswith("v=") and os.path.exists(
                os.path.join(base, d, "_SUCCESS")
            ):
                out.append(int(d[2:]))
        return sorted(out)

    def write_snapshot(self, df: DataFrame, layer: str, table: str) -> int:
        """Append an immutable, numbered snapshot of ``df`` and return
        its version — the reproducibility primitive for training-data
        releases: a model's data card pins (layer, table, version) and
        re-reading that triple yields byte-identical rows forever,
        regardless of later pipeline runs.

        Commit protocol is write-then-visible: the snapshot writes
        into its own fresh ``v=N`` directory and becomes a committed
        version only when the parquet job drops ``_SUCCESS`` as its
        final act — no rename window, no partial-version reads, safe
        under concurrent readers. At scale this is a directory-per-
        release layout (object-store friendly: immutable prefixes,
        trivially lifecycle-tiered); storage cost is bounded with
        :meth:`prune_snapshots`.
        """
        versions = self.list_snapshots(layer, table)
        version = (versions[-1] + 1) if versions else 1
        df.write.mode("error").parquet(
            os.path.join(self.snapshot_dir(layer, table), f"v={version}")
        )
        return version

    def read_snapshot(
        self, layer: str, table: str, version: int | None = None
    ) -> DataFrame:
        """Read a pinned snapshot (default: latest committed)."""
        versions = self.list_snapshots(layer, table)
        if not versions:
            raise FileNotFoundError(
                f"no snapshots for {layer}.{table} under "
                f"{self.snapshot_dir(layer, table)}"
            )
        if version is None:
            version = versions[-1]
        if version not in versions:
            raise FileNotFoundError(
                f"snapshot v={version} of {layer}.{table} not found "
                f"(have {versions})"
            )
        return self.spark.read.parquet(
            os.path.join(self.snapshot_dir(layer, table), f"v={version}")
        )

    def prune_snapshots(self, layer: str, table: str, keep_last: int) -> list[int]:
        """Drop all but the newest ``keep_last`` committed snapshots
        (and any uncommitted debris). Returns the versions removed.
        Retention runs newest-first off the committed list, so a
        concurrent writer's in-flight version is never touched."""
        import shutil

        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        versions = self.list_snapshots(layer, table)
        doomed = versions[:-keep_last] if len(versions) > keep_last else []
        for v in doomed:
            shutil.rmtree(os.path.join(self.snapshot_dir(layer, table), f"v={v}"))
        return doomed
