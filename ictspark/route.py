"""Route stage (SURVEY.md S9/S10): fan rows out to per-category sinks.

The reference physically moves logs into per-product/per-date directory trees
(/root/reference/src/main.rs:95-106,126-129; daily_yield.rs:242-291 loops
products). Spark-first translation: ONE write of the enriched DataFrame,
partitioned by (route_key, day) — the storage layout IS the router, no driver
loop, no per-sink job. At 100 TB this is a single shuffle-free pass (the
partitioning is done by the writer's dynamic-partition insert).

Format: 'parquet' (default) lays out `route_key=<k>/day=<d>/` directories —
byte-layout-compatible with an Iceberg identity(route_key)/days(ts) spec.
'iceberg' is honored when the runtime jar + catalog are configured
(ICTSPARK_FORMAT=iceberg); the sandbox has no Iceberg jar offline
(SURVEY.md §7 risk note), so tests run on the parquet layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def route_columns(df: DataFrame) -> DataFrame:
    return df.withColumn("day", F.to_date("ts"))


def write_routed(
    df: DataFrame, path: str, fmt: str | None = None, files_per_partition: int = 1
) -> None:
    """Fan-out write. Repartitions on the partition columns first so each
    (route_key, day) sink gets `files_per_partition` files instead of one
    sliver per upstream task (the small-files problem at 1000 executors).
    files_per_partition > 1 adds a deterministic conv_id-hash salt so one huge
    route/day partition can still be written by many tasks in parallel.
    """
    fmt = fmt or os.environ.get("ICTSPARK_FORMAT", "parquet")
    routed = route_columns(df)
    if files_per_partition > 1:
        salt = F.pmod(F.xxhash64("conv_id"), F.lit(files_per_partition))
        routed = routed.repartition(F.col("route_key"), F.col("day"), salt)
    else:
        routed = routed.repartition(F.col("route_key"), F.col("day"))
    if fmt == "iceberg":
        routed.writeTo(path).partitionedBy(F.col("route_key"), F.days("ts")).createOrReplace()
        return
    (
        routed.write.mode("overwrite")
        .partitionBy("route_key", "day")
        .parquet(path)
    )


def read_routed(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or os.environ.get("ICTSPARK_FORMAT", "parquet")
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def sink_counts(spark: SparkSession, path: str) -> DataFrame:
    """Per-sink row counts (routed-row parity check input)."""
    return read_routed(spark, path).groupBy("route_key").count().withColumnRenamed("count", "n")


def compact_routed(spark: SparkSession, path: str, files_per_partition: int = 1) -> None:
    """Compaction pass for the routed store: rewrite each (route_key, day)
    partition into `files_per_partition` files (the small-files maintenance job
    Iceberg's rewrite_data_files would run; parquet-layout equivalent).
    Writes to a temp sibling then swaps atomically-ish via rename."""
    import shutil
    import uuid

    df = read_routed(spark, path)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    write_routed(df.drop("day"), tmp, files_per_partition=files_per_partition)
    bak = path + "__old"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
