"""Explicit hot-key handling (north_rule: "skew handled explicitly").

Two regimes:

1. **Algebraic aggregates** (sum/count/min/max — everything in
   ictspark.aggregates): Spark's map-side partial aggregation already combines
   hot conv_ids locally before the shuffle, so no salt is needed. This is a
   design property, not luck — SEMANTICS.md keeps every report algebraic.

2. **Holistic aggregates** (collect_list/collect_set, exact distinct,
   percentile): partial aggregation cannot shrink a hot key below its row
   count, so one reducer receives the whole hot group. ``salted_agg`` splits
   each group across `n_salts` reducers with a deterministic conv-hash salt,
   then merges the per-salt partials — the classic two-phase salted shuffle.

AQE skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in
ictspark.session) covers the join side; the routed fan-out write uses the same
salt idea via write_routed(files_per_partition=...) (route.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from a secondary hash of the
    key — same key always gets the same salt distribution."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key), F.lit(42)), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial: list[Column],
    final: Callable[[DataFrame], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) with `partial` aggregates,
    then groupBy(keys) merging via `final(partial_df) -> [Column]`.

    Example — exact per-conv distinct steps (holistic: countDistinct can't
    map-side combine a hot conv):

        salted_agg(steps, ["conv_id"],
                   partial=[F.collect_set("step").alias("s")],
                   final=lambda d: [F.size(F.array_distinct(F.flatten(F.collect_list("s")))).alias("n_steps")])
    """
    phase1 = with_salt(df, keys[0], n_salts).groupBy(*keys, "_salt").agg(*partial)
    return phase1.groupBy(*keys).agg(*final(phase1))


def conv_turn_stats(transcripts: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-conv turn/char totals + exact distinct tool count, computed with the
    salted two-phase shape (the hot 1% convs have 100× turns — FIXTURES.md)."""
    return salted_agg(
        transcripts,
        ["conv_id"],
        partial=[
            F.count(F.lit(1)).alias("p_turns"),
            F.sum(F.length("text")).alias("p_chars"),
            F.collect_set("tool").alias("p_tools"),
        ],
        final=lambda d: [
            F.sum("p_turns").cast("long").alias("n_turns"),
            F.sum("p_chars").cast("long").alias("n_chars"),
            F.size(F.array_distinct(F.flatten(F.collect_list("p_tools")))).cast("long").alias(
                "n_tools"
            ),
        ],
    )
