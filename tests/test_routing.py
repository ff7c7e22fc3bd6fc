"""Route/fan-out tests: per-sink counts + routed-row equality (north_rule)."""

import tempfile

from pyspark.sql import functions as F

from ictspark import aggregates as A
from ictspark import enrich, io, parse, route


def test_routed_row_equality(spark, smoke_sf_dir):
    """Union of all sinks == enriched input, row for row, under stable ordering."""
    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    enriched = enrich.enrich_steps(sa, tool_dim)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/routed"
        route.write_routed(enriched, path)
        back = route.read_routed(spark, path)
        # partition columns come back typed; compare on the full value set
        cols = [c for c in enriched.columns]
        a = enriched.select(*cols)
        b = back.select(*cols)
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_sink_counts_match_route_counts(spark, smoke_sf_dir):
    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    enriched = enrich.enrich_steps(sa, tool_dim)
    expected = {r["route_key"]: r["n"] for r in enriched.groupBy("route_key").agg(F.count(F.lit(1)).alias("n")).collect()}
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/routed"
        route.write_routed(enriched, path)
        got = {r["route_key"]: r["n"] for r in route.sink_counts(spark, path).collect()}
    assert got == expected
    assert set(got) == {"alpha", "beta", "gamma", "misc"}


def test_partition_layout_prunes(spark, smoke_sf_dir):
    """Reading one route_key must scan only that sink's files (partition pruning)."""
    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    enriched = enrich.enrich_steps(sa, tool_dim)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/routed"
        route.write_routed(enriched, path)
        one = route.read_routed(spark, path).where(F.col("route_key") == "alpha")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "alpha" in plan  # partition filter visible in the scan
        assert one.count() > 0


def test_compaction_preserves_rows(spark, smoke_sf_dir):
    """compact_routed rewrites partitions without changing content."""
    import glob
    import tempfile

    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    enriched = enrich.enrich_steps(sa, tool_dim)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/routed"
        route.write_routed(enriched, path, files_per_partition=4)
        before = route.read_routed(spark, path)
        cols = sorted(before.columns)
        snap = {tuple(r) for r in before.select(*cols).collect()}
        files_before = len(glob.glob(f"{path}/*/*/*.parquet"))
        route.compact_routed(spark, path, files_per_partition=1)
        after = route.read_routed(spark, path)
        got = {tuple(r) for r in after.select(*cols).collect()}
        assert got == snap
        files_after = len(glob.glob(f"{path}/*/*/*.parquet"))
        # at smoke scale AQE may already coalesce to 1 file/partition; compaction
        # must never INCREASE the file count
        assert files_after <= files_before
