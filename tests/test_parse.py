"""Parse-stage tests: grammar selectivity, both implementations identical,
per-turn text reassembly invariant (input_hint)."""

import os

from pyspark.sql import functions as F

from ictspark import io, parse


def test_parse_selective_grammar(spark, smoke_sf_dir):
    """Filler/near-miss lines ('STEPPING...', 'retest scheduled...') must not parse."""
    t = io.load_transcripts(spark, smoke_sf_dir)
    steps = parse.parse_steps(t)
    bad = steps.where(~F.col("step").rlike(r"^[crvldu][0-9]{3}(%[A-Z]+)?$")).count()
    assert bad == 0
    assert steps.where(~F.col("status").isin("pass", "fail", "error")).count() == 0
    assert steps.count() > 0


def test_arrow_parse_equals_builtin(spark, smoke_sf_dir):
    t = io.load_transcripts(spark, smoke_sf_dir)
    a = parse.parse_steps(t)
    b = parse.parse_steps_arrow(t)
    assert [(f.name, f.dataType) for f in a.schema] == [(f.name, f.dataType) for f in b.schema]
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_limits_mapping(spark, smoke_sf_dir):
    """LIM3 steps (v-prefix) carry nom; LIM2 steps don't; d/u steps carry none."""
    t = io.load_transcripts(spark, smoke_sf_dir)
    s = parse.parse_steps(t)
    assert s.where((F.col("step").startswith("v")) & F.col("nom").isNull()).count() == 0
    assert s.where((F.col("step").startswith("c")) & F.col("nom").isNotNull()).count() == 0
    assert (
        s.where(F.col("step").substr(1, 1).isin("d", "u") & F.col("value").isNotNull()).count() == 0
    )
    bad_order = s.where(F.col("lo").isNotNull() & (F.col("lo") >= F.col("hi"))).count()
    assert bad_order == 0


def test_reassembly_roundtrip(spark, smoke_sf_dir):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering."""
    t = io.load_transcripts(spark, smoke_sf_dir)
    lines = parse.explode_lines(t)
    rebuilt = lines.groupBy("conv_id", "turn_idx").agg(
        F.concat_ws(
            "\n",
            F.transform(F.array_sort(F.collect_list(F.struct("line_no", "line"))), lambda s: s["line"]),
        ).alias("rebuilt")
    )
    j = rebuilt.join(t, ["conv_id", "turn_idx"])
    assert j.where(F.col("rebuilt") != F.col("text")).count() == 0
    assert j.count() == t.count()


def test_tool_calls_and_retest_markers(spark, smoke_sf_dir):
    t = io.load_transcripts(spark, smoke_sf_dir)
    tc = parse.parse_tool_calls(t)
    assert tc.where(F.col("called_tool") == "").count() == 0
    assert tc.count() > 0
    rm = parse.parse_retest_markers(t)
    assert rm.where(F.col("attempt_claimed") < 2).count() == 0
