"""Property-based parser fuzz: the Spark regex parse and the independent
pure-Python oracle regex must agree on ANY text, including adversarial
near-miss lines."""

import os

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from ictspark import parse, pyoracle

step_names = st.from_regex(r"[crvldu][0-9]{3}(%[A-Z]{1,3})?", fullmatch=True)
statuses = st.sampled_from(["pass", "fail", "error"])
floats = st.floats(min_value=-999, max_value=999, allow_nan=False).map(lambda v: f"{v:.4f}")

valid_step = st.builds(
    lambda s, st_, v, lim: f"STEP {s} STATUS={st_}"
    + (f" VALUE={v}" if v else "")
    + (lim or ""),
    step_names,
    statuses,
    st.one_of(st.none(), floats),
    st.one_of(
        st.none(),
        st.builds(lambda a, b: f" LIM2={a},{b}", floats, floats),
        st.builds(lambda a, b, c: f" LIM3={a},{b},{c}", floats, floats, floats),
    ),
)

near_miss = st.sampled_from(
    [
        "STEP  c613 STATUS=pass",  # double space
        "STEP c613 STATUS=PASS",  # wrong case
        "STEP x613 STATUS=pass",  # bad prefix
        "STEP c61 STATUS=pass",  # short number
        "STEP c6133 STATUS=pass",  # long number
        "STEP c613 STATUS=pass VALUE=abc",
        "STEP c613 STATUS=pass LIM2=1.0",  # missing second bound
        " STEP c613 STATUS=pass",  # leading space
        "STEP c613%on STATUS=pass",  # lowercase suffix
        "STEPc613 STATUS=pass",
        "STEP c613 STATUS=pass EXTRA=1",
        "RETEST c613 ATTEMPT=x",
        "TOOL_CALL  ARGS=",
        "random filler line",
    ]
)

turn_text = st.lists(st.one_of(valid_step, near_miss), min_size=1, max_size=6)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(turn_text, min_size=1, max_size=8), st.randoms())
def test_spark_parse_agrees_with_python_re(spark, tmp_path_factory, turns, _rnd):
    rows = []
    base_ts = pd.Timestamp("2024-03-01")
    for i, turn_lines in enumerate(turns):
        rows.append(
            {
                "conv_id": f"conv-{i % 7:04d}-{(i % 3) + 1:02d}",
                "turn_idx": i,
                "role": "tool",
                "text": "\n".join(turn_lines),
                "tool": "meas_voltage",
                "ts": base_ts + pd.Timedelta(seconds=i),
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark can't read NANOS parquet
    d = tmp_path_factory.mktemp("fuzz")
    p = os.path.join(str(d), "fuzz.parquet")
    pdf.to_parquet(p)
    t = spark.read.parquet(p)
    got = {
        (r["conv_id"], r["turn_idx"], r["line_no"]): (
            r["step"], r["status"], r["value"], r["lo"], r["nom"], r["hi"],
        )
        for r in parse.parse_steps(t).collect()
    }
    exp = {
        (s["conv_id"], s["turn_idx"], s["line_no"]): (
            s["step"], s["status"], s["value"], s["lo"], s["nom"], s["hi"],
        )
        for s in pyoracle.parse_steps(p)
    }
    assert got == exp
