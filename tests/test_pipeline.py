"""ReportSet (shared-intermediate pipeline) must agree with the direct
per-query aggregates — same semantics, different materialization strategy."""

import pytest

from ictspark import aggregates as A
from ictspark import io, parse
from ictspark.pipeline import ReportSet


@pytest.fixture(scope="module")
def rs(spark, smoke_sf_dir):
    t = io.load_transcripts(spark, smoke_sf_dir)
    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    r = ReportSet(t, tool_dim)
    r.materialize()
    yield r
    r.unpersist()


@pytest.fixture(scope="module")
def sa(spark, smoke_sf_dir):
    return A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir))).cache()


def _same(a, b):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_yields_agree(rs, sa):
    _same(rs.yields(), A.yields(sa))


def test_hourly_agree(rs, sa):
    _same(rs.hourly_stats(), A.hourly_stats(sa))


def test_failure_counts_agree(rs, sa):
    _same(rs.failure_counts(), A.failure_counts(sa))


def test_mb_results_agree(rs, sa):
    _same(rs.mb_results(), A.mb_results(sa))


def test_failed_boards_agree(rs, sa):
    _same(rs.failed_boards(), A.failed_boards(sa))


def test_first_fail_agree(rs, sa):
    _same(rs.first_fail(), A.first_fail(sa))
