"""Two-cluster-size scaling evidence (BASELINE.json north_rule; no real cluster
in this sandbox): run the identical production-shaped job (scripts/_scaling_job.py:
materialize → reports → route-write over ictspark.pipeline.ReportSet) at several
parallelism levels on the same input, and write BENCH/BASELINE.md.

Round-2 methodology tightening (VERDICT r01 item 6):

1. CPU confinement (taskset). "local[N]" alone is NOT an N-CPU measurement:
   the JVM's GC threads, shuffle IO threads and Python helpers run unconfined,
   so small-N levels borrow extra host CPUs and the measured speedup is
   understated. Every job AND every native calibration now runs under
   `taskset -c 0-(N-1)` — cluster size N means N physical CPUs, full stop.
2. Same-window interleaved calibration: the native hardware burn runs
   immediately before and after each level's job (not in a separate pass), so
   host noise hits pipeline and ceiling alike; both samples are reported.
3. Variance disclosed: per-rep times are published and the pair efficiency is
   given as min/median/max over all cross-rep ratios, not a single number.
4. Input tier sf4 (~19M turns): the per-phase single-threaded driver cost
   (~1-3 s plan analysis) is < 5% of the smallest measured phase, so fixed
   overhead no longer masquerades as poor scaling.

Why calibration at all: this is a shared VM — even an embarrassingly parallel
native workload (multiprocessing sha256, no JVM, no shuffle) may not reach 4x
between confined CPU sets if the host is contended. Reporting pipeline
efficiency alongside the hardware's own ceiling separates "the pipeline
doesn't scale" from "the box doesn't".
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import subprocess
import sys
import time
from datetime import datetime, timezone
from multiprocessing import Pool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS = [(2, 8), (8, 32)]


def _burn(n: int) -> int:
    h = b"x"
    for i in range(n):
        h = hashlib.sha256(h + str(i).encode()).digest()
    return h[0]


def hw_rate(procs: int, total: int = 6_000_000, reps: int = 2) -> float:
    """Native sha256 throughput (ops/s) at a process count, CONFINED to that
    many CPUs (children inherit the affinity) — best of reps."""
    old = os.sched_getaffinity(0)
    os.sched_setaffinity(0, set(range(procs)))
    try:
        best = 0.0
        for _ in range(reps):
            t0 = time.time()
            with Pool(procs) as p:
                p.map(_burn, [total // procs] * procs)
            best = max(best, total / (time.time() - t0))
        return best
    finally:
        os.sched_setaffinity(0, old)


def run_job(cpus: int, sf_dir: str, reps: int = 3) -> dict:
    out = subprocess.run(
        [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable,
            os.path.join(REPO, "scripts", "_scaling_job.py"),
            sf_dir, str(cpus), str(reps),
        ],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _rep_e2es(job: dict) -> list[float]:
    return [
        m + r + w
        for m, r, w in zip(job["materialize_secs"], job["reports_secs"], job["write_secs"])
    ]


def main() -> None:
    sys.path.insert(0, REPO)
    from ictspark import synth

    # scaling tier: sf4 (~19M turns, 64 files) — small tiers are
    # fixed-overhead-dominated and understate scaling
    sf_dir = os.environ.get("ICTSPARK_SCALING_SF_DIR", synth.ensure("sf4"))
    levels = sorted({n for pair in PAIRS for n in pair})
    jobs: dict[int, dict] = {}
    hw_before: dict[int, float] = {}
    hw_after: dict[int, float] = {}
    for n in levels:
        hw_before[n] = hw_rate(n)
        jobs[n] = run_job(n, sf_dir)
        hw_after[n] = hw_rate(n)
    hw = {n: (hw_before[n] + hw_after[n]) / 2 for n in levels}

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    rows = "\n".join(
        f"| {n} CPUs (taskset 0-{n - 1}, local[{n}]) | {jobs[n]['best_e2e']} | "
        f"{jobs[n]['turns_per_sec']} | "
        f"{min(jobs[n]['materialize_secs'])} | {min(jobs[n]['reports_secs'])} | "
        f"{min(jobs[n]['write_secs'])} |"
        for n in levels
    )
    pair_rows = []
    crit = []
    for lo, hi in PAIRS:
        f = hi / lo
        effs = sorted(
            (e_lo / e_hi) / f for e_lo in _rep_e2es(jobs[lo]) for e_hi in _rep_e2es(jobs[hi])
        )
        eff = (jobs[hi]["turns_per_sec"] / jobs[lo]["turns_per_sec"]) / f
        hw_eff = (hw[hi] / hw[lo]) / f
        norm = eff / hw_eff
        crit.append((f"{lo}->{hi}", round(eff, 3), round(hw_eff, 3), round(norm, 3)))
        pair_rows.append(
            f"| {lo}→{hi} CPUs ({f:.0f}×) | {eff:.3f} "
            f"(min {effs[0]:.3f} / med {statistics.median(effs):.3f} / max {effs[-1]:.3f}) | "
            f"{hw_eff:.3f} | {norm:.3f} |"
        )
    hw_rows = "\n".join(
        f"| {n} | {hw_before[n]:,.0f} | {hw_after[n]:,.0f} | "
        f"{abs(hw_before[n] - hw_after[n]) / hw[n] * 100:.1f}% |"
        for n in levels
    )
    md = f"""# BENCH/BASELINE — scaling evidence ({stamp})

Protocol (BASELINE.md "Sandbox scaling protocol", tightened in r02): identical
production-shaped job (`scripts/_scaling_job.py`: parse→windows→persist
steps/runs/fails → all nine yield-report aggregates as one action → routed
fan-out write) on identical input ({jobs[levels[0]]["turns"]} turns, {sf_dir}).
Every job and every native calibration runs CPU-CONFINED via
`taskset -c 0-(N-1)` — "cluster size N" means N physical CPUs for the whole
process tree (JVM GC/shuffle threads included), not just N Spark task slots.
Best-of-{len(_rep_e2es(jobs[levels[0]]))} per phase after one excluded warmup
round (codegen/plan warm); per-rep times and cross-rep efficiency spread
published below.

| parallelism | e2e sec | turns/sec | materialize | reports | route write |
|---|---|---|---|---|---|
{rows}

| pair | pipeline efficiency (spread over reps) | hardware ceiling* | normalized (pipeline/ceiling) |
|---|---|---|---|
{chr(10).join(pair_rows)}

\\* hardware ceiling = scaling efficiency of a native, shuffle-free, JVM-free
multiprocessing sha256 burn, confined to the SAME CPU sets, interleaved with
the pipeline runs (measured immediately before and after each level — same
measurement window):

| CPUs | native ops/s before | after | window drift |
|---|---|---|---|
{hw_rows}

On a real multi-executor cluster (independent JVMs, independent memory buses —
the north_rule's actual deployment shape via spark-submit --py-files,
scripts/submit.sh) the partition strategy has no shared-host ceiling:
scan/parse are embarrassingly parallel over files, every aggregate is
map-side-combined before its shuffle, and the fan-out write is
hash-distributed by (route_key, day[, salt]).

Per-level raw JSON:
{json.dumps({str(k): v for k, v in jobs.items()}, indent=2)}

Criterion check (north_rule ≥ 0.8 per 4×): {json.dumps(crit)}

Sinks format: parquet directory layout (Iceberg runtime jar unavailable offline —
SURVEY.md §7 risk note; writer is format-flagged via ICTSPARK_FORMAT).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    preserved = ""
    if os.path.exists(out_path):
        old = open(out_path).read()
        if "<!-- PRESERVED -->" in old:
            preserved = old.split("<!-- PRESERVED -->", 1)[1]
    with open(out_path, "w") as f:
        f.write(md + "\n<!-- PRESERVED -->" + preserved)
    print(json.dumps({
        "levels": {str(n): jobs[n]["turns_per_sec"] for n in levels},
        "hw_rates": hw,
        "criterion": crit,
    }))


if __name__ == "__main__":
    main()
