"""Custom Spark 4 Python DataSource: keyset-partitioned external
extraction.

The reference extracts from an operational OLTP store with one big
cursor (`dags/churn_export_dag_cloude.py:378-596` — a single
psycopg2 SELECT paged on the driver). The Spark-native shape is a
PARTITIONED source: the driver plans N key ranges, every executor
opens its own cursor for one range, and the result is a regular
DataFrame feeding the same incremental plan (plans/extract.py). For
JDBC systems Spark ships that built-in; this module demonstrates the
same contract through the public Python DataSource API
(pyspark.sql.datasource, Spark 4) for sources WITHOUT a JDBC driver
— REST cursors, key-value scans, homegrown storage. The backing
"external system" here is a Parquet file read with pyarrow
range-filters (standing in for any keyset-paginated backend), which
also demonstrates per-partition predicate pushdown: each reader
passes its key range to the backend instead of filtering in Spark.

Everything is defined inside a factory function: cloudpickle then
serializes the classes BY VALUE, so executor Python workers never
need this repo on their import path (the repo-wide closure rule —
see operators/multimodal.py).
"""

from __future__ import annotations


def keyset_parquet_source():
    """Build (by value, executor-importable) the DataSource class.

    Options:
      path            backing parquet file/directory (the "OLTP table")
      partition_col   numeric keyset column to range-partition on
      num_partitions  cursor count (default 4)
      lower / upper   optional key bounds; footer min/max when absent
                      (one driver-side metadata read, no data pages)
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    def _data_files(path):
        """Single file or Spark-written directory → list of data files
        (Spark always writes parquet tables as directories; pyarrow's
        footer readers want individual files). Defined inside the
        factory so the pickled-by-value classes never reference this
        module by name."""
        import os

        if os.path.isdir(path):
            return sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        return [path]

    class KeyRange(InputPartition):
        def __init__(self, lo, hi, last):
            self.lo, self.hi, self.last = lo, hi, last

    class KeysetReader(DataSourceReader):
        def __init__(self, schema, options):
            self.schema_names = [f.name for f in schema.fields]
            self.path = options["path"]
            self.col = options["partition_col"]
            self.n = int(options.get("num_partitions", "4"))
            self.lower = options.get("lower")
            self.upper = options.get("upper")

        def _bounds(self):
            if self.lower is not None and self.upper is not None:
                return int(self.lower), int(self.upper)
            import pyarrow.parquet as pq

            los, his = [], []
            for f in _data_files(self.path):
                md = pq.ParquetFile(f).metadata
                idx = md.schema.to_arrow_schema().get_field_index(self.col)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or st.min is None or st.max is None:
                        raise ValueError(
                            f"{f} carries no min/max statistics for "
                            f"'{self.col}' — pass explicit lower/upper "
                            "options to plan the key ranges"
                        )
                    los.append(st.min)
                    his.append(st.max)
            if not los:
                raise ValueError(f"no parquet data files under {self.path}")
            return min(los), max(his)

        def partitions(self):
            lo, hi = self._bounds()
            span = max(1, -(-(hi - lo + 1) // self.n))
            out = []
            cur = lo
            while cur <= hi:
                nxt = min(cur + span, hi + 1)
                out.append(KeyRange(cur, nxt, nxt > hi))
                cur = nxt
            return out

        def read(self, partition):
            # The executor-side "cursor": the range predicate goes TO
            # the backend (pyarrow prunes row groups on footer stats)
            # — the pushdown a real keyset/REST source would do with
            # WHERE key >= lo AND key < hi.
            import pyarrow.parquet as pq

            tbl = pq.read_table(
                self.path,
                columns=self.schema_names,
                filters=[
                    (self.col, ">=", partition.lo),
                    (self.col, "<", partition.hi),
                ],
            )
            for batch in tbl.to_batches():
                cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
                yield from zip(*cols)

    class KeysetParquetDataSource(DataSource):
        @classmethod
        def name(cls):
            return "keyset_oltp"

        def schema(self):
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import from_arrow_schema

            return from_arrow_schema(
                pq.read_schema(_data_files(self.options["path"])[0])
            )

        def reader(self, schema):
            return KeysetReader(schema, self.options)

        def simpleStreamReader(self, schema):
            return KeysetStreamReader(schema, self.options)

    class KeysetStreamReader(SimpleDataSourceStreamReader):
        """Streaming keyset TAIL of the same backend: each microbatch
        reads the key range (last_seen, current_max] — the CDC-ish
        incremental extraction the reference approximates with its
        watermark store (`dags/churn_export_dag_cloude.py:378-596`
        re-queried per DAG run), expressed as a first-class Spark
        streaming source with engine-managed exactly-once offsets
        (the checkpoint holds {"last": key}, so a crashed batch
        replays the same range via readBetweenOffsets).

        Scale note: the SIMPLE stream-reader API prefetches each
        batch's rows on the driver by design — right for control-
        plane tails (watermark tables, registries, dimension deltas),
        NOT for fact volume. A high-volume tail implements
        DataSourceStreamReader with partitions() slicing the offset
        range exactly like KeysetReader.partitions does for batch.

        WRITER CONTRACT — strictly-increasing keys: the offset is the
        scan-time MAX key, so any row later appended with a key <= the
        committed max (an out-of-order backfill file) is OUTSIDE every
        future batch range and will never be delivered. That is the
        standard keyset-pagination contract, but it is easy to violate
        with file drops, so violations are DETECTED rather than
        silent: each ``read`` recounts the rows at-or-below the
        committed offset and any growth since the previous microbatch
        is logged and accumulated in ``late_rows_skipped``. Backfills
        that cannot honor the contract belong on the file-arrival
        stream (``streaming/file_stream.py``), which keys on file
        identity, not row keys. The detection state is in-memory and
        baselined at each offset commit; it does NOT survive a
        restart, so late rows appended while the query was down are
        not counted (see ``read`` for the exact windows)."""

        LOG = __import__("logging").getLogger("keyset_oltp.stream")

        def __init__(self, schema, options):
            self.schema_names = [f.name for f in schema.fields]
            self.path = options["path"]
            self.col = options["partition_col"]
            self.start_after = int(options.get("start_after", "-1"))
            # Late-append detection state (in-memory, resets on
            # restart — a detection aid, not part of the offset).
            self._rows_at_or_below: int | None = None
            self.late_rows_skipped = 0

        def _count_at_or_below(self, key) -> int:
            """Exact row count with key <= the committed offset.
            Row-group stats prune cleanly-separated groups; only
            straddling groups are read. Control-plane tables are
            small by design (see class docstring), so this stays
            cheap."""
            import pyarrow.parquet as pq

            return pq.read_table(
                self.path, columns=[self.col], filters=[(self.col, "<=", key)]
            ).num_rows

        def initialOffset(self):
            return {"last": self.start_after}

        def _current_max(self):
            import pyarrow.parquet as pq

            idx = None
            hi = None
            for f in _data_files(self.path):
                md = pq.ParquetFile(f).metadata
                if idx is None:
                    idx = md.schema.to_arrow_schema().names.index(self.col)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is not None and st.has_min_max:
                        hi = st.max if hi is None else max(hi, st.max)
            return hi

        def _read_range(self, lo_excl, hi_incl):
            import pyarrow.parquet as pq

            tbl = pq.read_table(
                self.path,
                columns=self.schema_names,
                filters=[
                    (self.col, ">", lo_excl),
                    (self.col, "<=", hi_incl),
                ],
            )
            rows = []
            for batch in tbl.to_batches():
                cols = [
                    batch.column(i).to_pylist() for i in range(batch.num_columns)
                ]
                rows.extend(zip(*cols))
            return rows

        def read(self, start):
            hi = self._current_max()
            last = start["last"]
            # Writer-contract check: rows newly appeared AT OR BELOW
            # the committed offset can never be delivered (see class
            # docstring) — count and log them instead of losing them
            # silently.
            if last >= 0:
                below = self._count_at_or_below(last)
                if (
                    self._rows_at_or_below is not None
                    and below > self._rows_at_or_below
                ):
                    late = below - self._rows_at_or_below
                    self.late_rows_skipped += late
                    self.LOG.warning(
                        "keyset_oltp: %d row(s) appended with %s <= the "
                        "committed offset %s — outside every future batch "
                        "range (strictly-increasing-key contract violated; "
                        "route backfills through the file-arrival stream)",
                        late,
                        self.col,
                        last,
                    )
                self._rows_at_or_below = below
            if hi is None or hi <= last:
                return iter([]), start  # no new keys: empty batch, same offset
            rows = self._read_range(last, hi)
            # Seed the baseline for the NEW offset AT COMMIT TIME with
            # an exact recount at hi — never `+= len(rows)`, which
            # silently folded in any row appended inside (last, hi]
            # between the pre-count and the read. Remaining blind
            # spots, by design of in-memory detection state: (a) rows
            # appended <= hi in the instant between _read_range and
            # this recount are baselined without having been
            # delivered; (b) after a RESTART the state is gone, so
            # rows appended below the checkpointed offset while the
            # query was down are folded into the first post-restart
            # baseline uncounted. Both windows are detection gaps
            # only — delivery semantics are unchanged.
            self._rows_at_or_below = self._count_at_or_below(hi)
            return iter(rows), {"last": int(hi)}

        def readBetweenOffsets(self, start, end):
            return iter(self._read_range(start["last"], end["last"]))

    return KeysetParquetDataSource


def register(spark) -> None:
    """Register the source so ``spark.read.format("keyset_oltp")``
    resolves; idempotent per session."""
    spark.dataSource.register(keyset_parquet_source())
