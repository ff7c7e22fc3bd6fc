"""A/B the routed-write spill fix (VERDICT r08 item 1a): the dynamic-
partition parquet writer SORTS each task's rows by (route_key, day) unless
enough concurrent output writers are allowed — that sort of the full wide
rows is the 2.8 GB memory + 0.5 GB disk spill the per-phase profiler
attributed to route_write at sf4/32 CPUs. The distinct (route_key, day,
salt) group count is small (#routes × #days × files_per_partition), so a
modest writer budget removes the sort entirely.

Runs the write phase at both settings, fresh plans, same session pattern as
_scaling_job. Usage: taskset -c 0-31 python scripts/write_spill_ab.py [sf]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ictspark import io
from ictspark import route as R
from ictspark.pipeline import ReportSet
from ictspark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf4"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("ICTSPARK_AB_REPS", "3"))
    spark = get_spark(cpus=cpus, app="ictspark-write-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()
    from ictspark import synth

    d = synth.ensure(sf)
    t = spark.read.parquet(os.path.join(d, "transcripts.parquet"))
    tool_dim = spark.read.parquet(os.path.join(d, "tool_dim.parquet"))
    rs = ReportSet(t, tool_dim)
    rs.materialize()

    results: dict[str, list[float]] = {}
    for label, writers in (("sorted_writer", "0"), ("concurrent_writers", "64")):
        spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", writers)
        times = []
        for i in range(reps + 1):  # first rep per config = warm, excluded
            tmp = tempfile.mkdtemp(prefix="ictspark_ab_")
            t0 = time.time()
            R.write_routed(
                rs.enriched(), f"{tmp}/routed",
                files_per_partition=max(1, cpus // 4),
            )
            dt = round(time.time() - t0, 2)
            shutil.rmtree(tmp, ignore_errors=True)
            if i > 0:
                times.append(dt)
        results[label] = times
    rs.unpersist()
    spark.stop()
    print(json.dumps({"sf": sf, "cpus": cpus, "write_secs": results}))


if __name__ == "__main__":
    main()
