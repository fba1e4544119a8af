"""Pluggable table-format strategies for warehouse storage.

The reference mutates Postgres tables in place (``INSERT … ON
CONFLICT``, ``DELETE``); a lakehouse deployment gets those semantics
from an ACID table format. This module is the switch point: the
``Warehouse`` facade (catalog.py) routes every read/write through a
``TableFormat``, so a production deployment flips ONE setting
(``SPARK_GRAFT_TABLE_FORMAT=delta``) and keeps the exact same
pipeline code while gaining real transactional guarantees.

Formats:

- ``ParquetFormat`` (default, always available): plain Parquet
  directories. No transaction log, so in-place semantics are
  emulated — keyed merges run as pure relational plans
  (operators/upsert.py) and rewrites go through ``safe_overwrite``'s
  self-healing temp-and-swap. Correct single-writer semantics; no
  isolation against concurrent writers.
- ``DeltaFormat``: Delta Lake (delta.io, Apache-2.0). Native ACID
  ``MERGE`` / ``DELETE`` / overwrite via the transaction log —
  concurrent-writer safe, time travel, scalable metadata. The
  ``delta-spark`` package is not installed in this environment, so
  the implementation is import-gated and exercised only through its
  unavailability path in tests; the code follows the public
  ``DeltaTable`` API exactly (docs.delta.io quickstart shapes).
- Iceberg would slot in the same way (``format("iceberg")`` +
  ``MERGE INTO`` SQL against a configured catalog); it needs a
  catalog name for path-independent identifiers, so it is left as a
  documented extension rather than dead code.

At 100 TB the format choice changes durability/concurrency, NOT the
relational plans: merges still shuffle (or bucket/broadcast) the
same way — Delta's MERGE is itself a join under the hood.
"""

from __future__ import annotations

import abc
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from teleco_etl_pipeline_spark.operators.upsert import (
    delete_where as relational_delete_where,
    heal_interrupted_swap,
    merge_upsert,
    safe_overwrite,
)


class TableFormat(abc.ABC):
    """Storage strategy for one warehouse table path."""

    name: str

    @abc.abstractmethod
    def read(self, spark: SparkSession, path: str) -> DataFrame: ...

    @abc.abstractmethod
    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None: ...

    @abc.abstractmethod
    def overwrite_atomic(self, df: DataFrame, path: str) -> None:
        """Overwrite ``path`` with ``df`` even when ``df`` lazily
        reads from ``path`` (the read-modify-write pattern every
        merge needs)."""

    @abc.abstractmethod
    def upsert(
        self,
        spark: SparkSession,
        path: str,
        source: DataFrame,
        keys: Sequence[str],
        update_cols: Sequence[str] | None = None,
    ) -> None:
        """Keyed MERGE of ``source`` into the table at ``path`` with
        column-subset update semantics (M1)."""

    @abc.abstractmethod
    def delete_where(self, spark: SparkSession, path: str, predicate: Column) -> None:
        """Delete matching rows in place (M4)."""


class ParquetFormat(TableFormat):
    """Plain Parquet directories — the zero-dependency default."""

    name = "parquet"

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        heal_interrupted_swap(path)
        return spark.read.parquet(path)

    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(path)

    def overwrite_atomic(self, df: DataFrame, path: str) -> None:
        safe_overwrite(df, path)

    def upsert(
        self,
        spark: SparkSession,
        path: str,
        source: DataFrame,
        keys: Sequence[str],
        update_cols: Sequence[str] | None = None,
    ) -> None:
        # Heal BEFORE the existence check: after a crash mid-swap the
        # table lives only at path+'.old', and treating that as "first
        # write" would replace the whole table with the source delta.
        heal_interrupted_swap(path)
        if os.path.exists(path):
            merged = merge_upsert(
                self.read(spark, path), source, keys, update_cols=update_cols
            )
            self.overwrite_atomic(merged, path)
        else:
            self.write(source, path)

    def delete_where(self, spark: SparkSession, path: str, predicate: Column) -> None:
        # Shared helper: SQL DELETE semantics (NULL predicate keeps the
        # row), matching DeltaFormat's native DELETE.
        self.overwrite_atomic(
            relational_delete_where(self.read(spark, path), predicate), path
        )


class DeltaFormat(TableFormat):
    """Delta Lake ACID tables (requires the ``delta-spark`` package
    and a session built with the Delta SQL extension)."""

    name = "delta"

    def __init__(self) -> None:
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "DeltaFormat needs the delta-spark package (pip install "
                "delta-spark) and a SparkSession configured with "
                "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension "
                "and spark.sql.catalog.spark_catalog="
                "org.apache.spark.sql.delta.catalog.DeltaCatalog"
            ) from e

    def _table(self, spark: SparkSession, path: str):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(spark, path)

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.format("delta").load(path)

    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        df.write.format("delta").mode(mode).save(path)

    def overwrite_atomic(self, df: DataFrame, path: str) -> None:
        # The transaction log makes a plain overwrite atomic AND safe
        # against readers of the previous snapshot — no swap dance.
        self.write(df, path, mode="overwrite")

    def upsert(
        self,
        spark: SparkSession,
        path: str,
        source: DataFrame,
        keys: Sequence[str],
        update_cols: Sequence[str] | None = None,
    ) -> None:
        if not os.path.exists(path):
            self.write(source, path)
            return
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        merge = self._table(spark, path).alias("t").merge(
            source.alias("s"), cond
        )
        if update_cols is None:
            merge = merge.whenMatchedUpdateAll()
        else:
            merge = merge.whenMatchedUpdate(
                set={c: f"s.`{c}`" for c in update_cols}
            )
        merge.whenNotMatchedInsertAll().execute()

    def delete_where(self, spark: SparkSession, path: str, predicate: Column) -> None:
        self._table(spark, path).delete(predicate)


_FORMATS: dict[str, type[TableFormat]] = {
    "parquet": ParquetFormat,
    "delta": DeltaFormat,
}


def get_format(name: str | None = None) -> TableFormat:
    """Resolve a format by name, defaulting to the
    ``SPARK_GRAFT_TABLE_FORMAT`` env var, then plain Parquet."""
    resolved = name or os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    try:
        cls = _FORMATS[resolved]
    except KeyError:
        raise ValueError(
            f"unknown table format {resolved!r}; available: {sorted(_FORMATS)}"
        ) from None
    return cls()
