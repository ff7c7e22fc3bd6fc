"""Deterministic synthetic transcript generator (FIXTURES.md §1–2).

Pure function of (scale name, GEN_VERSION): same inputs → byte-identical parquet.
No external data. Writes to /root/repo/synthdata/<sf>/{transcripts,tool_dim,role_dim}.parquet.

Grammar emitted into `text` (one marker per line, filler interleaved):
    TOOL_CALL <tool> ARGS=<k=v,...>
    RETEST <step> ATTEMPT=<k>
    STEP <step> STATUS=<pass|fail|error> [VALUE=<f>] [LIM2=<hi>,<lo> | LIM3=<nom>,<hi>,<lo>]

Reference analog: one i3070 logfile per board run (/root/reference/src/main.rs:497);
test-name syntax `c613 r412 v605%ON` (/root/reference/src/locals.rs:66).
"""

from __future__ import annotations

import json
import os
import zlib
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 3
SEED = 42
BASE_TS = datetime(2024, 3, 1, 0, 0, 0)  # UTC wall clock
CUTOVER_TS = BASE_TS + timedelta(hours=36)  # limit-change boundary (SURVEY A6)
SPREAD_S = 72 * 3600  # conv starts spread over 72 h → ≥48 hourly buckets

SYNTH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "synthdata")

# conversations per scale (FIXTURES.md: ~100 smoke / ~5k correctness / ~500k turns bench)
SCALES = {"sf0.001": 100, "sf0.01": 5000, "sf0.1": 30000}

TOOL_BY_PREFIX = {
    "c": "meas_capacitance",
    "r": "meas_resistance",
    "v": "meas_voltage",
    "l": "meas_inductance",
    "d": "meas_diode",
    "u": "test_digital",  # deliberately ABSENT from tool_dim → routes to 'misc'
}

FILLER = [
    "operator note: board staged on fixture",
    "assistant: proceeding with the measurement plan",
    "ambient 23.4C humidity 41%",
    "checking continuity before powered test",
    "nothing to report on this turn",
    "STEPPING through the plan",  # near-miss: must NOT match '^STEP ' marker
    "retest scheduled pending review",  # near-miss for RETEST marker
]


def _crc(s: str) -> int:
    return zlib.crc32(s.encode())


def step_pool() -> list[str]:
    """60 deterministic step names matching [crvldu][0-9]{3}(%[A-Z]+)?."""
    names = []
    prefixes = "crvldu"
    for i in range(60):
        p = prefixes[i % 6]
        num = 100 + (i * 97 + 13) % 900
        name = f"{p}{num}"
        if i % 7 == 3:
            name += "%ON" if i % 2 else "%OFF"
        names.append(name)
    return names


def base_limit(step: str) -> float:
    return 10.0 + (_crc(step) % 1000) / 10.0


def limit_changes_steps(pool: list[str]) -> set[str]:
    """Fixed ~2% subset whose limits change at CUTOVER_TS."""
    return {s for s in pool if _crc(s) % 43 == 0}


def tool_dim_rows() -> list[tuple[str, str, str, str]]:
    rows = [
        ("meas_capacitance", "analog", "F", "alpha"),
        ("meas_resistance", "analog", "Ohm", "alpha"),
        ("meas_inductance", "analog", "H", "alpha"),
        ("meas_voltage", "power", "V", "beta"),
        ("meas_diode", "semiconductor", "V", "gamma"),
        # test_digital intentionally missing → misc route (left-join coverage)
    ]
    for i, t in enumerate(
        [
            "search", "browser", "python", "bash", "calculator", "sql",
            "file_read", "file_write", "http_get", "summarize", "translate",
            "ocr", "speech", "planner", "retriever",
        ]
    ):
        rows.append((t, "agent", "-", ["alpha", "beta", "gamma", "misc"][i % 4]))
    return rows


def role_dim_rows() -> list[tuple[str, str, float]]:
    return [("user", "human", 1.0), ("assistant", "model", 0.5), ("tool", "system", 0.25)]


def _fmt(v: float) -> str:
    return f"{v:.4f}"


def _limits(step: str, ts: datetime, changed: set[str]) -> tuple[float, float, float]:
    b = base_limit(step)
    if step in changed and ts >= CUTOVER_TS:
        b *= 1.05
    return round(b * 0.9, 4), round(b, 4), round(b * 1.1, 4)


def generate(sf_name: str) -> dict[str, pa.Table]:
    n_convs = SCALES[sf_name]
    rng = np.random.RandomState(SEED + _crc(sf_name) % 1000)
    pool = step_pool()
    changed = limit_changes_steps(pool)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str | None] = []
    tss: list[datetime] = []

    # assign convs to sessions of 1..4 boards
    conv_specs: list[tuple[str, int]] = []  # (conv_id, global conv index)
    sess = 0
    ci = 0
    while ci < n_convs:
        k = int(rng.randint(1, 5))
        for b in range(1, k + 1):
            if ci >= n_convs:
                break
            conv_specs.append((f"conv-{sess:04d}-{b:02d}", ci))
            ci += 1
        sess += 1

    for conv_id, i in conv_specs:
        hot = (i % 100) == 7  # ~1% hot convs, 100× steps (skew exercise)
        base_n = int(rng.randint(3, 9))
        n_steps = base_n * 100 if hot else base_n
        if hot:
            run1 = [pool[j] for j in rng.randint(0, len(pool), size=n_steps)]
        else:
            run1 = [pool[j] for j in rng.choice(len(pool), size=min(n_steps, len(pool)), replace=False)]

        start = BASE_TS + timedelta(seconds=int(rng.randint(0, SPREAD_S)))
        t = start
        turn = 0

        def emit(role: str, text: str, tool: str | None) -> None:
            nonlocal turn, t
            conv_ids.append(conv_id)
            turn_idxs.append(turn)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(t)
            turn += 1
            t = t + timedelta(seconds=int(rng.randint(5, 90)))

        emit("user", f"please run the test plan for {conv_id}", None)

        # executions: run 1 all steps; failing steps retried (≤3 attempts)
        executions: list[tuple[str, int, str]] = []  # (step, attempt, status)
        pending = [(s, 1) for s in run1]
        while pending:
            nxt: list[tuple[str, int]] = []
            for step, attempt in pending:
                r = rng.random_sample()
                if attempt == 1:
                    status = "fail" if r < 0.10 else ("error" if r < 0.12 else "pass")
                else:
                    status = "fail" if r < 0.25 else ("error" if r < 0.27 else "pass")
                executions.append((step, attempt, status))
                if status != "pass" and attempt < 3:
                    nxt.append((step, attempt + 1))
            pending = nxt

        for step, attempt, status in executions:
            tool = TOOL_BY_PREFIX[step[0]]
            lines = []
            if rng.random_sample() < 0.25:
                lines.append(FILLER[int(rng.randint(0, len(FILLER)))])
            lines.append(f"TOOL_CALL {tool} ARGS=step={step},attempt={attempt}")
            if attempt >= 2:
                lines.append(f"RETEST {step} ATTEMPT={attempt}")
            stepline = f"STEP {step} STATUS={status}"
            pfx = step[0]
            if pfx in "crlv":
                lo, nom, hi = _limits(step, t, changed)
                val = round(float(rng.normal(nom, nom * 0.08)), 4)
                stepline += f" VALUE={_fmt(val)}"
                if pfx == "v":
                    stepline += f" LIM3={_fmt(nom)},{_fmt(hi)},{_fmt(lo)}"
                else:
                    stepline += f" LIM2={_fmt(hi)},{_fmt(lo)}"
            lines.append(stepline)
            if rng.random_sample() < 0.2:
                lines.append(FILLER[int(rng.randint(0, len(FILLER)))])
            emit("tool", "\n".join(lines), tool)
            if rng.random_sample() < 0.10:
                emit("assistant", FILLER[int(rng.randint(0, len(FILLER)))], None)

        emit("assistant", f"test plan for {conv_id} complete", None)

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    td = tool_dim_rows()
    tool_dim = pa.table(
        {
            "tool": pa.array([r[0] for r in td], pa.string()),
            "category": pa.array([r[1] for r in td], pa.string()),
            "unit": pa.array([r[2] for r in td], pa.string()),
            "route_key": pa.array([r[3] for r in td], pa.string()),
        }
    )
    rd = role_dim_rows()
    role_dim = pa.table(
        {
            "role": pa.array([r[0] for r in rd], pa.string()),
            "role_group": pa.array([r[1] for r in rd], pa.string()),
            "weight": pa.array([r[2] for r in rd], pa.float64()),
        }
    )
    return {"transcripts": transcripts, "tool_dim": tool_dim, "role_dim": role_dim}


def ensure(sf_name: str) -> str:
    """Generate (once) and return the synthdata dir for a scale name."""
    if sf_name not in SCALES:
        raise ValueError(f"unknown scale {sf_name!r}; known: {sorted(SCALES)}")
    out = os.path.join(SYNTH_ROOT, sf_name)
    meta_path = os.path.join(out, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("gen_version") == GEN_VERSION:
                return out
    os.makedirs(out, exist_ok=True)
    tables = generate(sf_name)
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    with open(meta_path, "w") as f:
        json.dump({"gen_version": GEN_VERSION, "sf": sf_name, "rows": tables["transcripts"].num_rows}, f)
    return out


def synth_dir_for(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our synthdata dir."""
    return ensure(os.path.basename(os.path.normpath(sf_dir)))


if __name__ == "__main__":
    import sys

    for sf in sys.argv[1:] or list(SCALES):
        d = ensure(sf)
        with open(os.path.join(d, "_meta.json")) as f:
            print(sf, json.load(f))
