"""Two-cluster-size scaling evidence (BASELINE.json north_rule; no real cluster
in the sandbox): run bench.py at local[8] and local[32] on the SAME input, report
throughput at both + efficiency = (tput32 / tput8) / 4 into BENCH/BASELINE.md."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sys.path.insert(0, REPO)
    from ictspark import synth

    # scaling tier: sf1 (~4.8M turns, 32 files) — sf0.1 is too small for 32 threads
    # to beat 8 (overhead-dominated), which would mis-measure scaling.
    default_dir = synth.ensure("sf1")
    sf_dir = os.environ.get("ICTSPARK_SCALING_SF_DIR", default_dir)
    lo_n, hi_n = 8, 32
    lo = run(lo_n, sf_dir)
    hi = run(hi_n, sf_dir)
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (hi_n / lo_n)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = f"""# BENCH/BASELINE — scaling evidence ({stamp})

Protocol (BASELINE.md "Sandbox scaling protocol"): identical job (bench.py pipeline:
parse → enrich → route-write → all yield aggregates) on identical input
({sf_dir}, {lo["turns"]} turns), two parallelism levels, same machine.

| parallelism | pipeline sec | turns/sec |
|---|---|---|
| local[{lo_n}] | {lo["value"]} | {lo["turns_per_sec"]} |
| local[{hi_n}] | {hi["value"]} | {hi["turns_per_sec"]} |

**Scaling efficiency (local[{lo_n}]→local[{hi_n}], factor {hi_n // lo_n}×): {eff:.3f}**
(criterion: ≥ 0.8 — note single-JVM local mode shares one scheduler/GC, so this
under-reports true multi-executor scaling; fixed costs like JVM startup are excluded
but per-query planning overhead is not.)

Per-stage seconds at local[{hi_n}]: {json.dumps(hi["queries"])}

Sinks format: parquet directory layout (Iceberg runtime jar unavailable offline —
SURVEY.md §7 risk note; writer is format-flagged via ICTSPARK_FORMAT).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"lo": lo, "hi": hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
