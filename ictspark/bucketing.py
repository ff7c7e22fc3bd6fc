"""Bucketed materialization: co-located joins/aggregations (SURVEY §4 "(absent)
join strategy" — our addition for scale).

At 10^12 turns the steps/runs tables are re-aggregated by conv_id-rooted keys
constantly (yield grains, retests, per-conv reports). Persisting them BUCKETED
by conv_id makes every such aggregation and self-join exchange-free: Spark
reads the bucket spec and skips the shuffle entirely. This module materializes
a bucketed steps table and proves the exchange disappears (test asserts the
physical plan has no Exchange for a conv-grain aggregate).

Parquet bucketing needs a saveAsTable (metastore-backed); the sandbox uses the
local spark-warehouse — on a cluster the same code targets the shared catalog,
or Iceberg's bucket(N, conv_id) partition transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, n_buckets: int = 16) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "turn_idx", "line_no")
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def has_exchange(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
