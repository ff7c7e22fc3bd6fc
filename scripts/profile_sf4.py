"""One full sf4 pipeline run with the Spark UI enabled; snapshots stage
metrics from the REST API BETWEEN phases, so shuffle bytes, input bytes and
spill are attributed PER PHASE (VERDICT r08 item 1 — "per-phase shuffle bytes
and spill in the sf4 run"). Usage:

    taskset -c 0-31 python scripts/profile_sf4.py [sf_name]   # CPUs via env

Env: SPARK_GRAFT_CPUS (default 32). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ictspark import synth
from ictspark import route as R
from ictspark.pipeline import ReportSet
from ictspark.session import get_spark

GB = 1024**3
# REST quantities summed per stage; spill fields are reported by the stages
# endpoint alongside the byte counters
FIELDS = {
    "input_gb": "inputBytes",
    "shuffle_write_gb": "shuffleWriteBytes",
    "shuffle_read_gb": "shuffleReadBytes",
    "mem_spill_gb": "memoryBytesSpilled",
    "disk_spill_gb": "diskBytesSpilled",
}


def _snapshot(ui: str, app_id: str) -> dict[str, float]:
    stages = json.loads(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ).read()
    )
    return {k: sum(s.get(v, 0) for s in stages) for k, v in FIELDS.items()}


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf4"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ["ICTSPARK_UI"] = "true"
    spark = get_spark(cpus=cpus, app="ictspark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    d = synth.ensure(sf_name)
    t = spark.read.parquet(os.path.join(d, "transcripts.parquet"))
    tool_dim = spark.read.parquet(os.path.join(d, "tool_dim.parquet"))
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    phases: dict[str, dict] = {}
    last = _snapshot(ui, app_id)

    def timed(name, fn):
        nonlocal last
        t0 = time.time()
        fn()
        wall = round(time.time() - t0, 2)
        now = _snapshot(ui, app_id)
        phases[name] = {"wall_s": wall} | {
            k: round((now[k] - last[k]) / GB, 3) for k in FIELDS
        }
        last = now

    rs = ReportSet(t, tool_dim)
    timed("materialize", rs.materialize)
    timed("reports", lambda: [df.count() for df in rs.all_reports().values()])
    timed(
        "product_composite",
        lambda: [df.count() for df in rs.product_reports().values()],
    )
    tmp = tempfile.mkdtemp(prefix="ictspark_prof_")
    try:
        timed(
            "route_write",
            lambda: R.write_routed(
                rs.enriched(), f"{tmp}/routed", files_per_partition=max(1, cpus // 4)
            ),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "sf": sf_name,
        "cpus": cpus,
        "turns": t.count(),
        "phases": phases,
        "e2e_s": round(sum(p["wall_s"] for p in phases.values()), 2),
        "totals": {
            k: round(sum(p[k] for p in phases.values()), 3) for k in FIELDS
        },
    }
    rs.unpersist()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
