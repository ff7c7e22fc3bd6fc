"""Adversarial-skew stress evidence (VERDICT r02 item 6).

The synth already plants ~1% hot convs (100× steps). This script builds a far
nastier variant of the sf4 transcripts — ~10% of ALL turns concentrated into
TEN mega-convs (~190k turns each at sf4) — runs the IDENTICAL ReportSet
aggregate workload on uniform vs skewed input in the same session, and prints
the e2e ratio. The defenses under test: map-side partial aggregation (hot
convs combine locally before the shuffle), window partitions at (conv_id,
step) grain (finer than the hot key), the salted routed write, and AQE skew
handling. Acceptance: skew/uniform e2e within ~1.2×.

Usage: python scripts/skew_bench.py [sf_name]   (default sf4)
Appends nothing; paste the JSON line into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from ictspark import synth
from ictspark import route as R
from ictspark.pipeline import ReportSet
from ictspark.session import get_spark

N_HOT = 10  # mega-convs
PCT_SELECT = 10  # % of convs remapped into them (≈ same % of turns)


def skewed_variant(spark, sf_name: str):
    """Deterministic remap: rows of ~PCT_SELECT% of convs (hash-chosen) are
    reassigned to N_HOT mega-convs; turn_idx is re-ranked inside each mega-conv
    so (conv_id, turn_idx) stays a key. Written once, cached on disk."""
    out = os.path.join(synth.SYNTH_ROOT, f"{sf_name}skew")
    tpath = os.path.join(out, "transcripts.parquet")
    if not os.path.isdir(tpath):
        os.makedirs(out, exist_ok=True)
        src = synth.ensure(sf_name)
        t = spark.read.parquet(os.path.join(src, "transcripts.parquet"))
        h = F.crc32(F.col("conv_id"))
        hot = F.pmod(h, F.lit(100)) < PCT_SELECT
        hot_id = F.format_string("hot-%04d-01", F.pmod(h, F.lit(N_HOT)).cast("int"))
        t2 = t.withColumn("_hot", hot).withColumn(
            "conv_id2", F.when(hot, hot_id).otherwise(F.col("conv_id"))
        )
        w = Window.partitionBy("conv_id2").orderBy("conv_id", "turn_idx")
        remapped = (
            t2.withColumn(
                "turn_idx2",
                F.when(F.col("_hot"), F.row_number().over(w) - 1).otherwise(F.col("turn_idx")),
            )
            .select(
                F.col("conv_id2").alias("conv_id"),
                F.col("turn_idx2").alias("turn_idx"),
                "role",
                "text",
                "tool",
                "ts",
            )
        )
        remapped.repartition(synth.N_FILES.get(sf_name, 32)).write.mode("overwrite").parquet(tpath)
    return spark.read.parquet(tpath)


def run_workload(spark, t, tool_dim, cpus: int) -> float:
    """The bench.py pipeline body: materialize + all report aggregates +
    product composite + routed fan-out write. Returns wall seconds."""
    t0 = time.time()
    rs = ReportSet(t, tool_dim)
    rs.materialize()
    for df in rs.all_reports().values():
        df.count()
    for df in rs.product_reports().values():
        df.count()
    tmp = tempfile.mkdtemp(prefix="ictspark_skew_")
    try:
        R.write_routed(rs.enriched(), f"{tmp}/routed", files_per_partition=max(1, cpus // 4))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    rs.unpersist()
    return time.time() - t0


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf4"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app="ictspark-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warmup

    src = synth.ensure(sf_name)
    uniform = spark.read.parquet(os.path.join(src, "transcripts.parquet"))
    tool_dim = spark.read.parquet(os.path.join(src, "tool_dim.parquet"))
    skewed = skewed_variant(spark, sf_name)

    n = uniform.count()
    assert skewed.count() == n  # remap moves rows, never adds/drops
    hot_turns = skewed.where(F.col("conv_id").startswith("hot-")).count()

    reps = int(os.environ.get("ICTSPARK_BENCH_REPS", "2"))
    u = min(run_workload(spark, uniform, tool_dim, cpus) for _ in range(reps))
    s = min(run_workload(spark, skewed, tool_dim, cpus) for _ in range(reps))
    out = {
        "metric": "skew_stress_e2e",
        "sf": sf_name,
        "turns": n,
        "hot_convs": N_HOT,
        "hot_turn_share": round(hot_turns / n, 4),
        "uniform_s": round(u, 2),
        "skew_s": round(s, 2),
        "ratio": round(s / u, 3),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
