"""The split-halves attribution experiment (VERDICT r08 item 1b): is the
8→32 single-JVM scaling residual the PLAN or the SHARED MEMORY BUS / JVM?

Three measurements on the same 32 host CPUs, same sf4 input, all
`taskset`-confined, all via the unchanged production job
(scripts/_scaling_job.py):

  A. solo16_half : ONE 16-CPU process (taskset 0-15) over HALF the input
  B. pair16      : TWO isolated 16-CPU processes CONCURRENTLY (taskset 0-15
                   and 16-31), each over its own half — "2 executors × 16
                   cores", the north_rule's actual multi-executor shape
  C. solo32_full : ONE 32-CPU process (taskset 0-31) over the full input —
                   the shape the 8→32 criterion measured
  D. quad8       : the north rule's LITERAL N→4N-executors shape — one
                   8-CPU process over a quarter vs FOUR concurrent 8-CPU
                   processes (disjoint CPU quarters) over the four quarters;
                   efficiency = combined / (4 × solo)

Interpretation:
  - pair16 combined throughput >> solo32  → the residual is INTRA-JVM
    (driver stage scheduling, GC, lock contention): two half-size JVMs on
    the SAME memory bus beat one big one, so a real multi-executor cluster
    (independent JVMs — the deployment the rule names) scales better than
    the single-JVM local[32] proxy can show.
  - pair16 ≈ solo32 (both ≪ 2× solo16_half) → the shared memory bus: more
    CPUs on this box cannot help ANY process shape, bus attribution stands.

Halves are symlink views (even/odd part files) so no data is rewritten;
dims are shared. Prints one JSON line; run during a quiet window.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "scripts", "_scaling_job.py")


def launch(cpu_lo: int, cpu_hi: int, sf_dir: str, cpus: int, reps: int):
    return subprocess.Popen(
        ["taskset", "-c", f"{cpu_lo}-{cpu_hi}", sys.executable, JOB,
         sf_dir, str(cpus), str(reps)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def finish(proc) -> dict:
    out, _ = proc.communicate()
    assert proc.returncode == 0, "scaling job failed"
    return json.loads(out.strip().splitlines()[-1])


def make_slice(full: str, which: int, stride: int, root: str) -> str:
    """Symlink view holding every ``stride``-th transcripts part file."""
    d = os.path.join(root, f"s{stride}_{which}")
    tdir = os.path.join(d, "transcripts.parquet")
    os.makedirs(tdir, exist_ok=True)
    parts = sorted(
        f for f in os.listdir(os.path.join(full, "transcripts.parquet"))
        if f.endswith(".parquet")
    )
    for f in parts[which::stride]:
        dst = os.path.join(tdir, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(full, "transcripts.parquet", f), dst)
    for dim in ("tool_dim.parquet", "role_dim.parquet"):
        dst = os.path.join(d, dim)
        if not os.path.exists(dst):
            os.symlink(os.path.join(full, dim), dst)
    return d


def main() -> None:
    sys.path.insert(0, REPO)
    from ictspark import synth

    full = os.environ.get("ICTSPARK_SCALING_SF_DIR", synth.ensure("sf4"))
    reps = int(os.environ.get("ICTSPARK_SPLIT_REPS", "2"))
    root = tempfile.mkdtemp(prefix="ictspark_split_")
    half_a = make_slice(full, 0, 2, root)
    half_b = make_slice(full, 1, 2, root)

    # A. one 16-CPU process over half the input (the pair's solo baseline)
    solo16 = finish(launch(0, 15, half_a, 16, reps))
    # C. one 32-CPU process over the full input (the criterion's shape)
    solo32 = finish(launch(0, 31, full, 32, reps))
    # B. two isolated 16-CPU processes, disjoint CPU sets, concurrent
    t0 = time.time()
    pa = launch(0, 15, half_a, 16, reps)
    pb = launch(16, 31, half_b, 16, reps)
    ja, jb = finish(pa), finish(pb)
    wall_pair = time.time() - t0

    combined = (ja["turns"] + jb["turns"]) / max(ja["best_e2e"], jb["best_e2e"])

    # D. the north rule's LITERAL shape — N→4N executors at fixed 8 cores
    # each: one 8-CPU "executor" process over a quarter of the input vs FOUR
    # concurrent 8-CPU executor processes on disjoint CPU quarters over the
    # four quarters. Efficiency = combined / (4 × solo).
    quarters = [make_slice(full, i, 4, root) for i in range(4)]
    solo8 = finish(launch(0, 7, quarters[0], 8, reps))
    t0 = time.time()
    procs = [launch(8 * i, 8 * i + 7, quarters[i], 8, reps) for i in range(4)]
    jq = [finish(p) for p in procs]
    wall_q = time.time() - t0
    combined_q = sum(j["turns"] for j in jq) / max(j["best_e2e"] for j in jq)

    out = {
        "input": full,
        "reps": reps,
        "solo16_half": {k: solo16[k] for k in ("cpus", "turns", "best_e2e", "turns_per_sec")},
        "solo32_full": {k: solo32[k] for k in ("cpus", "turns", "best_e2e", "turns_per_sec")},
        "pair16": {
            "a": {k: ja[k] for k in ("turns", "best_e2e", "turns_per_sec")},
            "b": {k: jb[k] for k in ("turns", "best_e2e", "turns_per_sec")},
            "combined_turns_per_sec": round(combined, 1),
            "wall_s": round(wall_pair, 1),
        },
        # two half-JVMs vs one big JVM on the SAME 32 CPUs
        "pair_vs_solo32": round(combined / solo32["turns_per_sec"], 3),
        # concurrency tax on one half-job: solo16 vs its concurrent twin
        "pair_vs_2x_solo16": round(combined / (2 * solo16["turns_per_sec"]), 3),
        "solo8_quarter": {k: solo8[k] for k in ("cpus", "turns", "best_e2e", "turns_per_sec")},
        "quad8": {
            "per_proc_turns_per_sec": [j["turns_per_sec"] for j in jq],
            "combined_turns_per_sec": round(combined_q, 1),
            "wall_s": round(wall_q, 1),
        },
        # the north rule's criterion in its literal multi-executor shape:
        # 1 executor → 4 executors at fixed per-executor size
        "executors_1_to_4_efficiency": round(
            combined_q / (4 * solo8["turns_per_sec"]), 3
        ),
        "quad_vs_solo32": round(combined_q / solo32["turns_per_sec"], 3),
        "phase_detail": {"solo16_half": solo16, "solo32_full": solo32,
                         "pair_a": ja, "pair_b": jb,
                         "solo8_quarter": solo8, "quad": jq},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
