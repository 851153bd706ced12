"""Tests for report cosmetics (O4/R2/R3), encoding repair (K2), and the
streaming profile surface."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bytefreq_spark.profile import (
    doubled_columns,
    machine_report,
    truncate_example_col,
)
from bytefreq_spark.scrub import (
    MOJIBAKE_MAP,
    repair_encoding_col,
    repair_encoding_series,
)


def test_truncate_example(spark):
    df = spark.createDataFrame(
        [("short",),
         ("this is a very long example value",),
         ("exactlytwentycharss!",),
         ("supercalifragilisticexpialidocious",)],
        ["v"],
    )
    out = [r["t"] for r in df.select(truncate_example_col(F.col("v"), 20).alias("t")).collect()]
    assert out[0] == "short"
    assert out[1] == "this is a very long..."  # word-boundary cut
    assert out[2] == "exactlytwentycharss!"    # exactly at limit: untouched
    assert out[3] == "supercalifragilistic..."  # no space: hard cut


def test_doubled_columns(spark):
    df = spark.createDataFrame([("Hello--World", "ABC 123")], ["a", "b"])
    row = doubled_columns(df).collect()[0]
    assert row["DQ_a"] == "Aa-Aa"
    assert row["DQ_b"] == "A 9"
    assert list(row.asDict()) == ["a", "b", "DQ_a", "DQ_b"]


def test_machine_report(spark):
    df = spark.createDataFrame([("X1",), ("Y2",)], ["code"])
    rows = machine_report(df, grain="LU", source="test.pip").collect()
    assert all(r["filename"] == "test.pip" and r["grain"] == "LU" for r in rows)
    assert {r["pattern"] for r in rows} == {"A9"}
    assert sum(r["count"] for r in rows) == 2


def test_encoding_repair_pandas_vs_native(spark):
    broken = ["cafÃ©", "â€œquotedâ€\x9d?", "naÃ¯ve stays", "clean text"]
    fixed_pd = repair_encoding_series(pd.Series(broken)).tolist()
    assert fixed_pd[0] == "café"
    assert fixed_pd[1].startswith("“quoted")
    assert fixed_pd[3] == "clean text"
    df = spark.createDataFrame([(b,) for b in broken], ["t"])
    fixed_sp = [r["f"] for r in df.select(repair_encoding_col(F.col("t")).alias("f")).collect()]
    assert fixed_sp == fixed_pd  # native ≡ pandas repair


def test_mojibake_roundtrip():
    # every map entry really is utf8-bytes-read-as-cp1252 of its target
    for bad, good in MOJIBAKE_MAP:
        assert good.encode("utf-8").decode("cp1252") == bad


def test_streaming_mask_frequency(spark, tmp_path):
    from bytefreq_spark.streaming.profile_stream import (
        read_transcript_stream,
        streaming_mask_frequency,
    )
    from bytefreq_spark.synth import gen_transcripts_pandas

    src = tmp_path / "stream_src"
    src.mkdir()
    pdf = gen_transcripts_pandas(40)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(src))

    stream = read_transcript_stream(spark, str(src))
    agg = streaming_mask_frequency(stream, "role", grain="LU", window="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("role_freq")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from role_freq").collect()
    assert out, "streaming aggregation produced no rows"
    total = sum(r["count"] for r in out)
    assert total == len(pdf)
    pats = {r["pattern"] for r in out}
    assert pats == {"a"}  # roles are lowercase words → LU 'a'
