"""Source loaders. Iceberg-first design with a parquet fallback (SURVEY §7 risk note):
the iceberg-spark-runtime jar is not available offline in this sandbox, so the
default format is parquet directories laid out with the same partition scheme a
`days(ts)`-partitioned Iceberg table would have. Every writer goes through
``ictspark.route`` which honors ``ICTSPARK_FORMAT=iceberg|parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ictspark import synth


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the synthesized transcripts table matching a driver sf dir."""
    d = synth.synth_dir_for(sf_dir)
    return spark.read.parquet(os.path.join(d, "transcripts.parquet"))


def load_dims(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    d = synth.synth_dir_for(sf_dir)
    return (
        spark.read.parquet(os.path.join(d, "tool_dim.parquet")),
        spark.read.parquet(os.path.join(d, "role_dim.parquet")),
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-provided TPC-H-ish table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_transcripts_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines transcript source (the common raw LLM-transcript dump
    format): declared schema, never inferred — a schema-inference pass over
    100 TB of JSON is itself a full scan."""
    from ictspark.schema import TRANSCRIPTS

    return spark.read.schema(TRANSCRIPTS).json(path)


def load_raw_logs(spark: SparkSession, path: str) -> DataFrame:
    """Raw per-conversation text-file source — the reference's actual input
    shape (one logfile per board, /root/reference/src/main.rs:441-505):
    every file becomes one conv, turns split on blank lines, conv_id from the
    filename, turn_idx by position. Returns (conv_id, turn_idx, text); ts and
    role/tool live inside the text markers at this layer (the parse stage
    extracts them), matching the reference where the filename+content carry
    everything. wholetext keeps one file per row; reads parallelize per file.

    Format contract: only ``*.log`` / ``*.txt`` files are read (pathGlobFilter
    at the scan — a stray README in the directory would otherwise merge into a
    bogus '' conversation), and turns must not contain blank lines INSIDE a
    turn: the blank line IS the turn delimiter, exactly as the reference's
    logfile format uses its record separators. A turn containing an interior
    blank line splits into two turns (the roundtrip reassembly_check catches
    this if it matters for a given corpus)."""
    from pyspark.sql import functions as F

    raw = (
        spark.read.option("pathGlobFilter", "*.{log,txt}")
        .text(path, wholetext=True)
        .withColumn(
            "conv_id",
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.(?:log|txt)$", 1),
        )
    )
    # 0-based turn numbering, matching the transcripts-table convention.
    # Belt-and-braces: drop any row that still ended with an empty conv_id
    # (e.g. a file matched by a user-supplied glob but not by the name regex)
    # rather than silently merging such files into one conversation.
    return raw.where(F.col("conv_id") != "").select(
        "conv_id",
        F.posexplode(F.split(F.col("value"), r"\n\n")).alias("turn_idx", "text"),
    )


def dedupe_transcripts(df: DataFrame) -> DataFrame:
    """Newest-wins dedupe on (conv_id, turn_idx) — the reference ingests
    newest-first and its push-dedupe therefore keeps the newest copy
    (main.rs:494-497, SURVEY O2). A deterministic window replaces
    dropDuplicates' arbitrary tie-break."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("ts"))
    return (
        df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    )
