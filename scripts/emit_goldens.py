"""Emit the golden JSON artifacts promised by FIXTURES.md §3 from the
pure-Python oracle (tests/golden/<sf>/*.json). These are inspection artifacts —
the pytest suite computes the same goldens in-memory and asserts Spark equality."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ictspark import pyoracle, synth


def main(sf: str = "sf0.001") -> None:
    d = synth.ensure(sf)
    steps = pyoracle.parse_steps(os.path.join(d, "transcripts.parquet"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden", sf)
    os.makedirs(out_dir, exist_ok=True)

    def dump(name: str, obj) -> None:
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True, default=str)

    y = pyoracle.golden_yield(steps)
    dump("golden_yield.json", {f"{lvl}/{gr}": {"ok": ok, "nok": nok} for (lvl, gr), (ok, nok) in y.items()})
    fc = pyoracle.golden_failure_counts(steps)
    dump("golden_failures.json", {f"{m}/{s}": n for (m, s), n in fc.items()})
    dump("golden_hourly.json", {h: {"ok": a, "nok": b} for h, (a, b) in pyoracle.golden_hourly(steps).items()})
    dump("golden_first_fail.json", pyoracle.golden_first_fail(steps))
    dump("golden_limit_changes.json", sorted(pyoracle.golden_limit_changes(steps)))
    dump(
        "golden_routes.json",
        pyoracle.golden_route_counts(steps, os.path.join(d, "tool_dim.parquet")),
    )
    print(f"goldens written to {out_dir}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
