"""TableFormat strategy: parquet behavior, env switching, and the
Delta gate (delta-spark is absent in this container, so Delta is
exercised through its unavailability contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.catalog import Warehouse
from teleco_etl_pipeline_spark.formats import (
    DeltaFormat,
    ParquetFormat,
    get_format,
)


def test_get_format_default_and_env(monkeypatch):
    assert isinstance(get_format(), ParquetFormat)
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    assert get_format().name == "parquet"
    with pytest.raises(ValueError, match="unknown table format"):
        get_format("orc-acid")


def test_delta_gate_is_explicit():
    """Without delta-spark installed, DeltaFormat must fail at
    construction with actionable guidance — never at first write."""
    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="delta-spark"):
        DeltaFormat()


def test_warehouse_routes_through_format(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    assert wh.fmt.name == "parquet"
    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    wh.write(df, "bronze", "t")
    assert wh.read("bronze", "t").count() == 5


def test_parquet_upsert_into_column_subset(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], ["k", "name", "v"]
    )
    wh.write(base, "bronze", "t")
    src = spark.createDataFrame(
        [(2, "B-new", 99), (3, "c", 30)], ["k", "name", "v"]
    )
    # Only v updates on match; name keeps the target value.
    wh.upsert_into(src, "bronze", "t", keys=["k"], update_cols=["v"])
    rows = {
        r["k"]: (r["name"], r["v"])
        for r in wh.read("bronze", "t").collect()
    }
    assert rows[1] == ("a", 10)  # untouched
    assert rows[2] == ("b", 99)  # v updated, name kept
    assert rows[3] == ("c", 30)  # inserted


def test_parquet_upsert_into_creates_missing_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    src = spark.createDataFrame([(1, 10)], ["k", "v"])
    wh.upsert_into(src, "bronze", "fresh", keys=["k"])
    assert wh.read("bronze", "fresh").count() == 1


def test_parquet_delete_where_in_place(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(10).select(F.col("id").alias("k"))
    wh.write(df, "bronze", "t")
    wh.fmt.delete_where(spark, wh.path("bronze", "t"), F.col("k") >= 7)
    assert wh.read("bronze", "t").count() == 7


def test_parquet_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is NULL are
    KEPT (matching Delta's native DELETE), not silently dropped by
    the ~predicate filter."""
    path = str(tmp_path / "t")
    fmt = ParquetFormat()
    df = spark.createDataFrame(
        [(1, 150.0), (2, 50.0), (3, None)], ["id", "score"]
    )
    fmt.write(df, path)
    fmt.delete_where(spark, path, F.col("score") > 100.0)
    left = {r["id"] for r in fmt.read(spark, path).collect()}
    assert left == {2, 3}  # NULL-score row survives


def test_parquet_upsert_heals_interrupted_swap(spark, tmp_path):
    """If a previous safe_overwrite crashed between its two renames
    (table only at path+'.old'), the next upsert must restore and
    MERGE — not treat the path as a first write and drop the table."""
    import os

    path = str(tmp_path / "t")
    fmt = ParquetFormat()
    fmt.write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), path)
    os.rename(path, path + ".old")  # simulate the crash window
    fmt.upsert(
        spark,
        path,
        spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"]),
        keys=["id"],
    )
    out = {r["id"]: r["v"] for r in fmt.read(spark, path).collect()}
    assert out == {1: "a", 2: "B", 3: "c"}  # pre-crash row 1 survives


def test_jsonl_round_trip_and_corrupt_record_quarantine(spark, tmp_path):
    import json
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from teleco_etl_pipeline_spark.sources.files import read_jsonl, write_jsonl

    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", "fr")],
        ["doc_id", "text", "lang"],
    )
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out, compression=None, shards=2)
    back = read_jsonl(spark, out)
    assert sorted((r["doc_id"], r["text"], r["lang"]) for r in back.collect()) == [
        (1, "hello world", "en"),
        (2, "bonjour", "fr"),
    ]

    # Malformed line: lenient read surfaces it via _corrupt_record
    # instead of silently dropping the row.
    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    with open(os.path.join(bad_dir, "part-0.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 3, "text": "ok", "lang": "en"}) + "\n")
        f.write("{not json at all\n")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    rows = read_jsonl(spark, bad_dir, schema=schema).collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["doc_id"] == 3
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("{not json")

    # gzip shard write: file count honors the explicit shard choice
    gz = str(tmp_path / "gz")
    write_jsonl(docs, gz, compression="gzip", shards=1)
    parts = [p for p in os.listdir(gz) if p.startswith("part-")]
    assert len(parts) == 1 and parts[0].endswith(".gz")
    assert back.schema["doc_id"].dataType == LongType()


def test_parquet_schema_evolution_merge_on_read(spark, tmp_path):
    """Additive schema evolution: a landing feed that grows a column
    mid-stream must stay readable as one table — old files surface
    NULL for the new column under mergeSchema, and the narrow read
    path (explicit schema) keeps working for consumers pinned to v1.
    At 100 TB mergeSchema's footer sweep is driver-side per file, so
    production tables pin the superset schema explicitly instead —
    both paths asserted here."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "v1col"]).write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "v1col", "v2col"]
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v1col", "v2col"}
    rows = {r["id"]: r["v2col"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}

    pinned = spark.read.schema("id long, v1col string, v2col double").parquet(p)
    assert {r["id"]: r["v2col"] for r in pinned.collect()} == rows
    v1_view = spark.read.schema("id long, v1col string").parquet(p)
    assert v1_view.count() == 2 and v1_view.columns == ["id", "v1col"]


def test_hidden_metadata_columns_give_row_lineage(spark, tmp_path):
    """Row-level lineage without storing it: the parquet reader's
    hidden _metadata struct surfaces source file identity per row —
    what the medallion layer's source_file column captures for CSV
    ingests, for free on columnar tables."""
    p = str(tmp_path / "lineage")
    spark.createDataFrame([(1,)], ["id"]).write.parquet(p)
    spark.createDataFrame([(2,)], ["id"]).write.mode("append").parquet(p)
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(p)
        .select(
            "id",
            F.col("_metadata.file_name").alias("f"),
            F.col("_metadata.file_size").alias("sz"),
        )
        .collect()
    )
    assert len(rows) == 2 and all(r["f"].endswith(".parquet") for r in rows)
    assert all(r["sz"] > 0 for r in rows)
    # two appends → two distinct physical files
    assert len({r["f"] for r in rows}) == 2
