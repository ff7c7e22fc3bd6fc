"""Data-quality validation over the transcripts table — the checks a training
pipeline runs before trusting an ingest batch: nulls, key duplicates, ordering
violations, id-shape conformance. ONE lazy pass: per-row flags (plus two window
comparisons) summed and stacked into (check, n_bad) rows — no driver-side
counting loop."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dq_report(transcripts: DataFrame) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    kw = Window.partitionBy("conv_id", "turn_idx")
    flagged = (
        transcripts.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("prev_idx", F.lag("turn_idx").over(w))
        .withColumn("key_n", F.count("*").over(kw))
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("conv_id").isNull(), 1).otherwise(0)).alias("null_conv_id"),
        F.sum(F.when(F.col("turn_idx").isNull(), 1).otherwise(0)).alias("null_turn_idx"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias("null_ts"),
        F.sum(F.when(F.col("key_n") > 1, 1).otherwise(0)).alias("dup_key_rows"),
        F.sum(
            F.when(F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts")), 1).otherwise(0)
        ).alias("ts_regressions"),
        F.sum(
            F.when(
                F.col("prev_idx").isNotNull() & (F.col("turn_idx") != F.col("prev_idx") + 1), 1
            ).otherwise(0)
        ).alias("turn_idx_gaps"),
        F.sum(
            F.when(~F.col("conv_id").rlike(r"^.*-[0-9]{2}$"), 1).otherwise(0)
        ).alias("malformed_conv_id"),
    )
    checks = [
        "null_conv_id", "null_turn_idx", "null_ts", "dup_key_rows",
        "ts_regressions", "turn_idx_gaps", "malformed_conv_id",
    ]
    stack = ", ".join(f"'{c}', {c}" for c in checks)
    return agg.selectExpr(f"stack({len(checks)}, {stack}) as (check, n_bad)", "n_total")
