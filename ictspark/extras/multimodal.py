"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The decode step is STUBBED (no image/audio libs in this container — the
`_decode` function raises NotImplementedError unless a deterministic fake is
requested), but the Spark-side plumbing is real and tested: binary schema,
Arrow batch transfer through mapInPandas, per-type partitioning, frame-sample
planning as a pure DataFrame op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def media_stats(media: DataFrame) -> DataFrame:
    """Per media_type: count + byte stats (payload stays opaque binary)."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg(F.length("payload")), 4).alias("avg_bytes"),
        F.sum(F.when(F.col("width").isNotNull(), 1).otherwise(0)).alias("n_with_dims"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index (pure
    DataFrame op — the decode of those frames is the stubbed part)."""
    v = media.where(F.col("media_type") == "video").select(
        "media_id", (F.col("duration_s") * F.col("fps")).cast("int").alias("n_frames")
    )
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact content dedup for binary media (what a multimodal corpus runs
    FIRST — byte-identical assets dominate crawl duplicates): hash-groupBy on
    md5 of the payload bytes, keep min media_id. md5 over hex(payload) so both
    engines hash the identical string representation."""
    return media.groupBy(F.md5(F.hex("payload")).alias("fp")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("media_id").alias("keeper"),
        F.min("media_type").alias("media_type"),
    )


def _decode(payload: bytes, media_type: str, fake: bool):
    """Decode stub. Real decode requires PIL/av/soundfile — not in this
    container. fake=True returns a deterministic stand-in so the Arrow
    pipeline around it is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this environment"
        )
    # deterministic fake "decoded signal": byte histogram moments. Quantize
    # with floor(x*1e4 + 0.5)/1e4 — identical IEEE ops in Python and DuckDB,
    # so the oracle matches bit-for-bit (Python round() is banker's rounding
    # and would diverge on exact half-ulp boundaries).
    import math

    n = len(payload)
    mean = sum(payload) / n if n else 0.0
    return n, math.floor(mean * 10000 + 0.5) / 10000


def featurize(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas featurizer: Arrow batches of binary payloads → per-item
    features. Batch shape: whole column as pd.Series of bytes; zero per-row
    Python outside the (stubbed) decode call itself."""
    schema = "media_id long, media_type string, n_bytes long, byte_mean double"

    def _batches(it):
        for pdf in it:
            out = pdf[["media_id", "media_type"]].copy()
            decoded = [
                _decode(p, t, fake_decode)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out["n_bytes"] = [d[0] for d in decoded]
            out["byte_mean"] = [d[1] for d in decoded]
            yield out

    return media.mapInPandas(_batches, schema)
