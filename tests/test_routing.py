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


def test_layout_conforms_to_iceberg_spec(spark, smoke_sf_dir):
    """The parquet fallback layout must match the identity(route_key)/days(ts)
    Iceberg partition spec exactly: one directory level per transform, named
    route_key=<k>/day=<yyyy-MM-dd>, and the directory set must equal the
    distinct (route_key, day) combinations in the data — so flipping
    ICTSPARK_FORMAT=iceberg on a cluster reads/writes the same partitioning."""
    import os
    import re

    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    enriched = enrich.enrich_steps(sa, tool_dim)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/routed"
        route.write_routed(enriched, path)
        on_disk = set()
        for rk_dir in os.listdir(path):
            if rk_dir.startswith(("_", ".")):
                continue
            assert re.fullmatch(r"route_key=[A-Za-z0-9_.-]+", rk_dir), rk_dir
            for day_dir in os.listdir(os.path.join(path, rk_dir)):
                if day_dir.startswith(("_", ".")):
                    continue
                assert re.fullmatch(r"day=\d{4}-\d{2}-\d{2}", day_dir), day_dir
                leaf = os.path.join(path, rk_dir, day_dir)
                files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
                assert files, f"empty partition dir {leaf}"
                on_disk.add((rk_dir.split("=", 1)[1], day_dir.split("=", 1)[1]))
        expected = {
            (r["route_key"], str(r["day"]))
            for r in route.route_columns(enriched).select("route_key", "day").distinct().collect()
        }
        assert on_disk == expected


def test_iceberg_branch_dispatch(spark, smoke_sf_dir, monkeypatch):
    """ICTSPARK_FORMAT=iceberg must dispatch to the writeTo/partitionedBy
    branch (executed up to the catalog lookup — the runtime jar is absent
    offline, so the failure must come from Spark's catalog resolution, not
    from our code path never running)."""
    import pytest

    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    enriched = enrich.enrich_steps(sa, tool_dim).limit(10)
    monkeypatch.setenv("ICTSPARK_FORMAT", "iceberg")
    with pytest.raises(Exception) as exc:
        route.write_routed(enriched, "ictspark_test.routed")
    # the branch ran: Spark rejected the unresolved catalog/table or the
    # missing iceberg source, not a Python-side error in route.py
    msg = str(exc.value)
    assert any(
        s in msg
        for s in ("TABLE_OR_VIEW_NOT_FOUND", "Catalog", "catalog", "iceberg", "DATA_SOURCE")
    ), msg


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
