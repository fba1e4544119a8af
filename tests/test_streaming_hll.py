"""Streaming HLL (streaming/stateful.py:streaming_hll_distinct):
the mergeable register set carried as per-key streaming state must,
after all micro-batches, equal the batch sketch computed over the
full input — the merge-by-MAX property run incrementally."""

from __future__ import annotations

import hashlib

from pyspark.sql import types as T

from teleco_etl_pipeline_spark.operators.sketch import _HLL_C, _HLL_M, _HLL_R


def _expected(users):
    regs = [0] * _HLL_M
    for v in users:
        h = hashlib.md5(str(v).encode()).hexdigest()
        b, tail = int(h[:2], 16), int(h[2:15], 16)
        rho = _HLL_R if tail == 0 else 52 - tail.bit_length() + 1
        regs[b] = max(regs[b], rho)
    z = sum(1 << (_HLL_R - x) for x in regs)
    return sum(1 for x in regs if x), z, _HLL_C / float(z)


def test_streaming_hll_converges_to_batch_sketch(spark, tmp_path):
    from teleco_etl_pipeline_spark.streaming.stateful import streaming_hll_distinct

    watch = tmp_path / "ev"
    watch.mkdir()
    # overlapping users across batches: the register MAX-merge must
    # dedup them exactly like one batch pass over the union
    b1 = [("click", u) for u in range(0, 400)]
    b2 = [("click", u) for u in range(200, 600)] + [("view", u) for u in range(50)]
    for name, rows in [("b1.csv", b1), ("b2.csv", b2)]:
        (watch / name).write_text(
            "event_type,user_id\n" + "\n".join(f"{t},{u}" for t, u in rows) + "\n"
        )
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .load(str(watch))
    )
    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        emitted.extend(
            (batch_id, r["event_type"], r["n_nonzero"], r["z_scaled"], r["raw_estimate"])
            for r in batch_df.collect()
        )

    q = (
        streaming_hll_distinct(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    finals = {}
    for _bid, et, nn, z, est in sorted(emitted):
        finals[et] = (nn, z, est)
    want_click = _expected(range(600))  # union of both click batches
    want_view = _expected(range(50))
    assert finals["click"] == want_click
    assert finals["view"] == want_view
    # the estimate is in HLL's accuracy band for n=600 >> small-range
    est = finals["click"][2]
    assert abs(est - 600) / 600 < 0.30
    # click was updated in both batches: earlier emission must be a
    # register-subset state (smaller or equal nonzero count)
    clicks = [(nn, z) for _b, et, nn, z, _e in sorted(emitted) if et == "click"]
    assert len(clicks) == 2 and clicks[0][0] <= clicks[1][0]
