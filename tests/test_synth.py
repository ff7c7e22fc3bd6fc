"""Generator invariants: determinism, schema, skew plant, time spread."""

import os

import pyarrow.parquet as pq

from ictspark import synth


def test_schema(smoke_dir):
    t = pq.read_table(os.path.join(smoke_dir, "transcripts.parquet"))
    assert [f.name for f in t.schema] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(t.schema.field("turn_idx").type) == "int32"
    assert str(t.schema.field("ts").type).startswith("timestamp")


def test_turn_idx_dense_unique(smoke_dir):
    t = pq.read_table(os.path.join(smoke_dir, "transcripts.parquet")).to_pylist()
    by_conv = {}
    for r in t:
        by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for conv, idxs in by_conv.items():
        assert sorted(idxs) == list(range(len(idxs))), conv


def test_hot_convs_exist(smoke_dir):
    t = pq.read_table(os.path.join(smoke_dir, "transcripts.parquet")).to_pylist()
    sizes = {}
    for r in t:
        sizes[r["conv_id"]] = sizes.get(r["conv_id"], 0) + 1
    mx, md = max(sizes.values()), sorted(sizes.values())[len(sizes) // 2]
    assert mx > 20 * md  # ~1% hot convs at ~100× (FIXTURES.md skew plant)


def test_time_spread(smoke_dir):
    t = pq.read_table(os.path.join(smoke_dir, "transcripts.parquet")).to_pylist()
    hours = {r["ts"].replace(minute=0, second=0, microsecond=0) for r in t}
    assert len(hours) >= 48
    days = {r["ts"].date() for r in t}
    assert len(days) >= 3  # crosses day boundaries (06:00 shift coverage)


def test_ensure_embeddings_unknown_tier_raises():
    """ADVICE r06: an unsupported synthetic-embeddings tier must raise a
    descriptive ValueError naming the supported tiers, not a bare KeyError."""
    import pytest

    from ictspark import synth

    with pytest.raises(ValueError, match="sf1"):
        synth.ensure_embeddings("sf9")
