"""Alternate source formats (S1 from raw files / JSONL): both must reproduce
the parquet source row-for-row — the per-turn text-equality invariant from a
user's actual raw dumps."""

import os
import tempfile

from pyspark.sql import functions as F

from ictspark import io


def test_jsonl_source_roundtrip(spark, smoke_sf_dir):
    t = io.load_transcripts(spark, smoke_sf_dir)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "dump")
        t.selectExpr(
            "conv_id", "turn_idx", "role", "text", "tool",
            "date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss\") AS ts",
        ).write.json(p)
        back = io.load_transcripts_jsonl(spark, p)
        cols = ["conv_id", "turn_idx", "role", "text", "tool"]
        a = t.select(*cols, F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"))
        b = back.select(*cols, F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"))
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_raw_logfile_source_text_equality(spark, smoke_sf_dir):
    """Dump every conv to one .log file (reference input shape), re-read via
    load_raw_logs: per-(conv, turn) text equality must hold exactly."""
    t = io.load_transcripts(spark, smoke_sf_dir)
    convs = (
        t.groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("body")
        )
        .collect()
    )
    with tempfile.TemporaryDirectory() as d:
        for r in convs:
            with open(os.path.join(d, f"{r['conv_id']}.log"), "w") as f:
                f.write(r["body"])
        back = io.load_raw_logs(spark, d)
        j = back.join(
            t.select("conv_id", "turn_idx", F.col("text").alias("orig")),
            ["conv_id", "turn_idx"],
            "full",
        )
        assert j.where(F.col("text").isNull() | F.col("orig").isNull()).count() == 0
        assert j.where(F.col("text") != F.col("orig")).count() == 0
