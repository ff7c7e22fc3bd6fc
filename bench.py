#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline parse→enrich→route→
aggregate pipeline on the synthesized transcripts matching $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) at local[$SPARK_GRAFT_CPUS], prints ONE JSON line.

Headline metric: end-to-end pipeline seconds (parse once + all yield-report
aggregates + route fan-out write), with per-stage splits and turns/sec — the
BASELINE.json authoritative throughput metric. Scaling protocol (local[8] vs
local[32]) lives in scripts/scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from ictspark import aggregates as A
from ictspark import enrich, io, parse
from ictspark import route as R
from ictspark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    spark = get_spark(cpus=cpus, app="ictspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so stage timings reflect steady state, not first-job cost
    spark.range(1_000_000).select(F.sum("id")).collect()

    t = io.load_transcripts(spark, sf_dir)
    tool_dim, _ = io.load_dims(spark, sf_dir)
    n_turns = t.count()

    q: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        q[name] = round(time.time() - t0, 3)

    # one shared parse (production shape: parse once, aggregate many — SURVEY §3.1)
    sa = A.with_attempt(parse.parse_steps(t))
    timed("parse_cache", lambda: sa.persist().count())
    timed("yield_report", lambda: A.yields(sa).collect())
    timed("failure_counts", lambda: A.failure_counts(sa).count())
    timed("failures_by_index", lambda: A.failures_by_index(sa).count())
    timed("hourly_stats", lambda: A.hourly_stats(sa).count())
    timed("mb_results", lambda: A.mb_results(sa).count())
    timed("limit_changes", lambda: A.limit_changes(sa).collect())
    timed("first_fail", lambda: A.first_fail(sa).count())
    timed("failed_boards", lambda: A.failed_boards(sa).count())
    enriched = enrich.enrich_steps(sa, tool_dim)
    timed("route_counts", lambda: enriched.groupBy("route_key").count().collect())
    tmp = tempfile.mkdtemp(prefix="ictspark_bench_")
    try:
        timed("route_write", lambda: R.write_routed(enriched, f"{tmp}/routed"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    sa.unpersist()
    # cold single-pass parse with the Arrow UDF variant, for comparison
    timed("parse_arrow_variant", lambda: parse.parse_steps_arrow(t).count())

    pipeline = round(sum(v for k, v in q.items() if k != "parse_arrow_variant"), 3)
    out = {
        "metric": "pipeline_e2e",
        "value": pipeline,
        "unit": "sec",
        "queries": q,
        "sf": sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / pipeline, 1),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
