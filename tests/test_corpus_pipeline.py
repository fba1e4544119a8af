"""Composed corpus-curation pipeline invariants (plans/corpus.py).

The per-stage operators are oracle-checked individually; here we pin
the COMPOSITION's contract: flags are monotone (a doc can only
survive stage N if it survived N-1), the split partitions the final
survivors, and the reported counts agree with the flag frame they
are derived from.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.corpus import curation_flags, q_corpus_curation
from teleco_etl_pipeline_spark.sources.tables import load_table


def test_flags_monotone_and_split_partitions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    flags = curation_flags(docs).cache()
    try:
        assert flags.count() == docs.count()  # one row per doc, no dupes
        # monotone: nd_keep ⇒ e_keep ⇒ q_keep
        assert (
            flags.filter(
                (F.col("nd_keep") & ~F.col("e_keep"))
                | (F.col("e_keep") & ~F.col("q_keep"))
            ).count()
            == 0
        )
        # pipeline actually prunes something at this SF
        n_raw = flags.count()
        n_final = flags.filter("nd_keep").count()
        assert 0 < n_final < n_raw
        # split is total over survivors and only takes the three values
        splits = {
            r["split"]
            for r in flags.filter("nd_keep").select("split").distinct().collect()
        }
        assert splits <= {"train", "valid", "test"}
    finally:
        flags.unpersist()


def test_reported_counts_match_flags(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    flags = curation_flags(docs).cache()
    try:
        reported = {
            r["stage"]: r["rows_kept"]
            for r in q_corpus_curation(spark, sf_dir).collect()
        }
        assert reported["raw"] == flags.count()
        assert reported["quality"] == flags.filter("q_keep").count()
        assert reported["exact_dedup"] == flags.filter("e_keep").count()
        assert reported["near_dedup"] == flags.filter("nd_keep").count()
        assert (
            reported["split_train"] + reported["split_valid"] + reported["split_test"]
            == reported["near_dedup"]
        )
    finally:
        flags.unpersist()
