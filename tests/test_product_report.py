"""write_product composite invariants (daily_yield.rs:82-169 analog)."""

import pytest
from pyspark.sql import functions as F

from ictspark import enrich, io, parse
from ictspark import aggregates as A
from ictspark import product_report as PR


@pytest.fixture(scope="module")
def es_a(spark, smoke_sf_dir):
    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    return enrich.enrich_steps(sa, tool_dim).cache()


def test_product_hourly_totals_row(es_a):
    h = PR.product_hourly(es_a)
    per_route = (
        h.where("hour <> 'TOTAL'")
        .groupBy("route_key")
        .agg(F.sum("ok").alias("ok"), F.sum("nok").alias("nok"))
    )
    totals = h.where("hour = 'TOTAL'").select("route_key", "ok", "nok")
    assert per_route.exceptAll(totals).count() == 0
    assert totals.count() == per_route.count()


def test_product_failures_wide_join(es_a):
    w = PR.product_daily_failures(es_a).where("step <> 'TOTAL'")
    # after-retest count never exceeds the All count; NULL = probe miss (blank)
    bad = w.where(F.col("n_fail_after_retest") > F.col("n_fail_all")).count()
    assert bad == 0
    assert w.count() > 0
    # every (route, step) in the after-retest list appears in the All list
    # (left-join preserves exactly the All keys)
    fails = es_a.where("status <> 'pass'")
    n_all = fails.select("route_key", "step").distinct().count()
    assert w.count() == n_all


def test_failed_boards_display_dedupe(es_a):
    d = PR.failed_boards_display(es_a)
    # exactly one visible DMC per ever-failing conv; repeats blanked
    n_convs = d.where("dmc_display <> ''").count()
    per_run = es_a.groupBy("conv_id", "attempt").agg(
        F.max(F.when(F.col("status") != "pass", 1).otherwise(0)).alias("any_fail")
    )
    exp = per_run.where("any_fail = 1").select("conv_id").distinct().count()
    assert n_convs == exp
    # every listed run belongs to an ever-failing conv; blanked rows are attempt > 1
    assert d.where((F.col("dmc_display") == "") & (F.col("attempt") == 1)).count() == 0


def test_product_workbook_sections_match_components(es_a):
    """The workbook union must carry each section's rows verbatim, in
    worksheet order (hourly=1, failures=2, failed_boards=3)."""
    wb = PR.product_workbook(es_a).cache()
    counts = {r["section"]: r["n"] for r in wb.groupBy("section").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["hourly"] == PR.product_hourly(es_a).count()
    assert counts["failures"] == PR.product_daily_failures(es_a).count()
    assert counts["failed_boards"] == PR.product_failed_boards(es_a).count()
    orders = {r["section"]: r["o"] for r in wb.select("section", F.col("section_order").alias("o")).distinct().collect()}
    assert orders == {"hourly": 1, "failures": 2, "failed_boards": 3}
    wb.unpersist()


def test_export_matrix_vertical_is_transposed_long_form(spark, smoke_sf_dir):
    """Vertical orientation = the pivot's long form: same (conv, step, value)
    triples as the horizontal export matrix."""
    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    v = A.export_matrix_vertical(sa)
    wide = A.export_matrix(sa)
    n_nonnull = 0
    for s in A.EXPORT_STEPS:
        safe = "val_" + "".join(c if c.isalnum() else "_" for c in s.lower())
        n_nonnull += wide.where(F.col(safe).isNotNull()).count()
    assert v.where(F.col("value").isNotNull()).count() == n_nonnull
    assert set(v.columns) == {"step", "conv_id", "value"}
