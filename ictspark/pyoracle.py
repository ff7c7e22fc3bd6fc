"""Pure-Python reference oracle (SURVEY.md §5.2) — the stand-in for the
non-vendored ICT_logfile crate. Independent implementation: plain `re` + dicts,
no pandas/Spark/SQL, so a bug shared with the pipeline is unlikely.

Consumes a transcripts parquet, emits golden dicts (FIXTURES.md §3) that the
pytest suite asserts Spark output against.
"""

from __future__ import annotations

import re
from collections import defaultdict
from datetime import datetime

import pyarrow.parquet as pq

STEP_RX = re.compile(
    r"^STEP ([crvldu][0-9]{3}(?:%[A-Z]+)?) STATUS=(pass|fail|error)"
    r"(?: VALUE=(-?[0-9]+\.[0-9]+))?"
    r"(?: LIM2=(-?[0-9]+\.[0-9]+),(-?[0-9]+\.[0-9]+)"
    r"| LIM3=(-?[0-9]+\.[0-9]+),(-?[0-9]+\.[0-9]+),(-?[0-9]+\.[0-9]+))?$"
)

TSF = "%Y-%m-%d %H:%M:%S"


def _fmt(ts: datetime) -> str:
    return ts.strftime(TSF)


def parse_steps(transcripts_path: str) -> list[dict]:
    """One dict per STEP line, with attempt rank + is_last per (conv, step)."""
    tbl = pq.read_table(transcripts_path)
    rows = tbl.to_pylist()
    steps: list[dict] = []
    for r in rows:
        for line_no, line in enumerate((r["text"] or "").split("\n")):
            m = STEP_RX.match(line)
            if not m:
                continue
            step, status, value, l2hi, l2lo, l3nom, l3hi, l3lo = m.groups()
            sess, _, board = r["conv_id"].rpartition("-")
            steps.append(
                {
                    "conv_id": r["conv_id"],
                    "session_id": sess,
                    "board_idx": int(board),
                    "turn_idx": r["turn_idx"],
                    "line_no": line_no,
                    "ts": r["ts"],
                    "tool": r["tool"],
                    "step": step,
                    "status": status,
                    "value": float(value) if value else None,
                    "lo": float(l2lo) if l2lo else (float(l3lo) if l3lo else None),
                    "nom": float(l3nom) if l3nom else None,
                    "hi": float(l2hi) if l2hi else (float(l3hi) if l3hi else None),
                }
            )
    # attempt ranking
    by_key: dict[tuple, list[dict]] = defaultdict(list)
    for s in steps:
        by_key[(s["conv_id"], s["step"])].append(s)
    for execs in by_key.values():
        execs.sort(key=lambda s: (s["turn_idx"], s["line_no"]))
        for i, s in enumerate(execs):
            s["attempt"] = i + 1
            s["is_last"] = i == len(execs) - 1
    return steps


def runs_of(steps: list[dict]) -> dict[tuple, dict]:
    """(conv_id, attempt) → {run_ts, any_fail, session_id, board_idx}."""
    runs: dict[tuple, dict] = {}
    for s in steps:
        k = (s["conv_id"], s["attempt"])
        r = runs.setdefault(
            k,
            {"run_ts": s["ts"], "any_fail": 0, "session_id": s["session_id"], "board_idx": s["board_idx"]},
        )
        r["run_ts"] = min(r["run_ts"], s["ts"])
        if s["status"] != "pass":
            r["any_fail"] = 1
    return runs


def golden_yield(steps: list[dict]) -> dict[tuple[str, str], tuple[int, int]]:
    """(level, grain) → (ok, nok)."""
    runs = runs_of(steps)
    out: dict[tuple[str, str], tuple[int, int]] = {}

    def tally(fails: list[int]) -> tuple[int, int]:
        nok = sum(fails)
        return len(fails) - nok, nok

    out[("conv", "first")] = tally([r["any_fail"] for (c, a), r in runs.items() if a == 1])
    final: dict[str, int] = defaultdict(int)
    for s in steps:
        final[s["conv_id"]] |= 1 if (s["is_last"] and s["status"] != "pass") else 0
    out[("conv", "after_retest")] = tally(list(final.values()))
    out[("conv", "total")] = tally([r["any_fail"] for r in runs.values()])

    sess_first: dict[str, int] = defaultdict(int)
    sess_total: dict[tuple, int] = defaultdict(int)
    for (c, a), r in runs.items():
        if a == 1:
            sess_first[r["session_id"]] |= r["any_fail"]
        sess_total[(r["session_id"], a)] |= r["any_fail"]
    out[("session", "first")] = tally(list(sess_first.values()))
    out[("session", "total")] = tally(list(sess_total.values()))
    sess_final: dict[str, int] = defaultdict(int)
    for s in steps:
        sess_final[s["session_id"]] |= 1 if (s["is_last"] and s["status"] != "pass") else 0
    out[("session", "after_retest")] = tally(list(sess_final.values()))
    return out


def golden_failure_counts(steps: list[dict]) -> dict[tuple[str, str], int]:
    """(mode, step) → n_fail."""
    out: dict[tuple[str, str], int] = defaultdict(int)
    for s in steps:
        if s["status"] == "pass":
            continue
        out[("all", s["step"])] += 1
        if s["attempt"] == 1:
            out[("first", s["step"])] += 1
        if s["is_last"]:
            out[("after_retest", s["step"])] += 1
    return dict(out)


def golden_hourly(steps: list[dict]) -> dict[str, tuple[int, int]]:
    """hour string → (ok, nok) over runs."""
    runs = runs_of(steps)
    out: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for r in runs.values():
        h = _fmt(r["run_ts"].replace(minute=0, second=0, microsecond=0))
        out[h][r["any_fail"]] += 1
    return {h: (v[0], v[1]) for h, v in out.items()}


def golden_first_fail(steps: list[dict]) -> dict[str, tuple[str, int, str]]:
    """conv_id → (step, turn_idx, ts) of first failing execution."""
    out: dict[str, tuple] = {}
    for s in sorted(steps, key=lambda s: (s["conv_id"], s["turn_idx"], s["line_no"])):
        if s["status"] != "pass" and s["conv_id"] not in out:
            out[s["conv_id"]] = (s["step"], s["turn_idx"], _fmt(s["ts"]))
    return out


def golden_limit_changes(steps: list[dict]) -> set[str]:
    tuples: dict[str, set] = defaultdict(set)
    for s in steps:
        if s["lo"] is not None:
            tuples[s["step"]].add((s["lo"], s["nom"], s["hi"]))
    return {k for k, v in tuples.items() if len(v) > 1}


def golden_route_counts(steps: list[dict], tool_dim_path: str) -> dict[str, int]:
    dim = {r["tool"]: r["route_key"] for r in pq.read_table(tool_dim_path).to_pylist()}
    out: dict[str, int] = defaultdict(int)
    for s in steps:
        out[dim.get(s["tool"], "misc")] += 1
    return dict(out)


def golden_product_failures(
    steps: list[dict], tool_dim_path: str
) -> dict[tuple[str, str], tuple[int, int | None]]:
    """write_product failure table (daily_yield.rs:127-144): per (route_key,
    step), (n_fail_all, n_fail_after_retest-or-None); plus per-route TOTAL
    rows where the after-retest total counts only matched probes (0 if none)."""
    dim = {r["tool"]: r["route_key"] for r in pq.read_table(tool_dim_path).to_pylist()}
    allf: dict[tuple[str, str], int] = defaultdict(int)
    art: dict[tuple[str, str], int] = defaultdict(int)
    for s in steps:
        if s["status"] == "pass":
            continue
        key = (dim.get(s["tool"], "misc"), s["step"])
        allf[key] += 1
        if s["is_last"]:
            art[key] += 1
    out: dict[tuple[str, str], tuple[int, int | None]] = {}
    totals: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for key, n in allf.items():
        a = art.get(key)
        out[key] = (n, a)
        totals[key[0]][0] += n
        totals[key[0]][1] += a or 0
    for route, (ta, tr) in totals.items():
        out[(route, "TOTAL")] = (ta, tr)
    return out


def golden_error_bursts(steps: list[dict]) -> dict[str, tuple[int, int]]:
    """conv_id → (n_bursts, max_burst): maximal runs of consecutive failing
    executions under (turn_idx, line_no) order (r03)."""
    by_conv: dict[str, list[dict]] = defaultdict(list)
    for s in steps:
        by_conv[s["conv_id"]].append(s)
    out: dict[str, tuple[int, int]] = {}
    for conv, execs in by_conv.items():
        execs.sort(key=lambda s: (s["turn_idx"], s["line_no"]))
        n_bursts = max_burst = cur = 0
        for s in execs:
            if s["status"] != "pass":
                cur += 1
                if cur == 1:
                    n_bursts += 1
                max_burst = max(max_burst, cur)
            else:
                cur = 0
        if n_bursts:
            out[conv] = (n_bursts, max_burst)
    return out


def golden_tool_latency(transcripts_path: str) -> dict[str, tuple[int, float, float]]:
    """tool → (n_calls, avg_gap_s, max_gap_s): gap to the previous turn of the
    same conv by turn_idx, over turns with a non-null tool (r03)."""
    rows = pq.read_table(transcripts_path).to_pylist()
    by_conv: dict[str, list[dict]] = defaultdict(list)
    for r in rows:
        by_conv[r["conv_id"]].append(r)
    gaps: dict[str, list[float]] = defaultdict(list)
    for conv, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        for prev, cur in zip(turns, turns[1:]):
            if cur["tool"] is not None:
                gaps[cur["tool"]].append((cur["ts"] - prev["ts"]).total_seconds())
    return {
        t: (len(g), round(sum(g) / len(g), 4), round(max(g), 4)) for t, g in gaps.items()
    }
