"""Cross-batch stateful dedup: state must carry between micro-batches
(maxFilesPerTrigger=1 over two files → two micro-batches in one run)."""

from __future__ import annotations

import pandas as pd


def test_stateful_dedup_across_batches(spark, tmp_path):
    from bytefreq_spark.streaming.stateful_dedup import stateful_dedup_stream
    from bytefreq_spark.synth import TRANSCRIPT_SCHEMA

    src = tmp_path / "src"
    src.mkdir()

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        pdf["ts"] = pd.Timestamp("2025-01-01")
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / name))

    # batch 1: conv A turns 0-1 (turn 1 repeats turn 0)
    write_file("f1", [
        ("A", 0, "user", "hello there", None, None),
        ("A", 1, "assistant", "hello there", None, None),
        ("B", 0, "user", "unique one", None, None),
    ])
    # batch 2: conv A turn 2 repeats turn 1 — CROSS-BATCH duplicate;
    # conv B turn 5 repeats nothing consecutive (gap) → not dup
    write_file("f2", [
        ("A", 2, "user", "hello there", None, None),
        ("A", 3, "user", "fresh text", None, None),
        ("B", 5, "user", "unique one", None, None),
    ])

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stateful_dedup_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps an availableNow query in state-cleanup
    # epochs forever (awaitTermination silently burned its full 180s timeout
    # every run; processAllAvailable hangs outright) — poll the sink for the
    # expected 6 rows, then stop.
    import time as _time

    deadline = _time.time() + 120
    while (_time.time() < deadline
           and spark.sql("select count(*) from dedup_out").collect()[0][0] < 6):
        _time.sleep(1)
    q.stop()
    rows = {(r["conv_id"], r["turn_idx"]): r["is_dup"]
            for r in spark.sql("select * from dedup_out").collect()}
    assert len(rows) == 6
    assert rows[("A", 0)] is False
    assert rows[("A", 1)] is True     # intra-batch dup
    assert rows[("A", 2)] is True     # CROSS-batch dup (state carried)
    assert rows[("A", 3)] is False
    assert rows[("B", 0)] is False
    assert rows[("B", 5)] is False    # non-consecutive turn gap → not a dup
