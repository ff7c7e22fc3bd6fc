"""One full sf4 pipeline run with the Spark UI enabled; pulls stage metrics
from the REST API and prints the resource profile BENCH/BASELINE.md records
(input bytes, shuffle bytes, per-phase wall time). Usage:
    python scripts/profile_sf4.py [sf_name]
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


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf4"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ["ICTSPARK_UI"] = "true"
    spark = get_spark(cpus=cpus, app="ictspark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    d = synth.ensure(sf_name)
    t = spark.read.parquet(os.path.join(d, "transcripts.parquet"))
    tool_dim = spark.read.parquet(os.path.join(d, "tool_dim.parquet"))

    phases: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        phases[name] = round(time.time() - t0, 2)

    rs = ReportSet(t, tool_dim)
    timed("materialize", rs.materialize)
    timed("reports", lambda: [df.count() for df in rs.all_reports().values()])
    timed("product_composite", lambda: [df.count() for df in rs.product_reports().values()])
    tmp = tempfile.mkdtemp(prefix="ictspark_prof_")
    try:
        timed(
            "route_write",
            lambda: R.write_routed(rs.enriched(), f"{tmp}/routed", files_per_partition=max(1, cpus // 4)),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete").read()
    )
    gb = 1024**3
    out = {
        "sf": sf_name,
        "cpus": cpus,
        "turns": t.count(),
        "phases_s": phases,
        "e2e_s": round(sum(phases.values()), 2),
        "input_gb": round(sum(s.get("inputBytes", 0) for s in stages) / gb, 2),
        "shuffle_write_gb": round(sum(s.get("shuffleWriteBytes", 0) for s in stages) / gb, 2),
        "shuffle_read_gb": round(sum(s.get("shuffleReadBytes", 0) for s in stages) / gb, 2),
        "n_stages": len(stages),
    }
    out["shuffle_to_input_ratio"] = round(out["shuffle_write_gb"] / max(out["input_gb"], 1e-9), 3)
    rs.unpersist()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
