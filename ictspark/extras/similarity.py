"""Similarity search over the `embeddings` table (array<float> column).

- ``ann_bruteforce``: exact top-k cosine via zip_with/aggregate dot products —
  the correctness baseline. O(Q·N); fine for a bounded query set.
- ``ann_bucketed``: sign-bucket LSH (first-8-dims sign key) — the scale path:
  candidates come from an equi-join on the bucket key instead of a cross join,
  so at 10^9 vectors the shuffle is per-bucket, not quadratic.
- ``embedding_dup_pairs``: near-duplicate vectors by cosine threshold.

All math is done in DOUBLE with explicit rounding so the DuckDB oracle
(list_inner_product on DOUBLE[]) matches bit-for-bit after round().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_QUERIES = 10  # vec_id < 10 are the query set
TOP_K = 5
SIGN_BITS = 8


def _with_norm(e: DataFrame) -> DataFrame:
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)).alias("norm"),
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def ann_bruteforce(embeddings: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact top-k cosine neighbors for the query set (vec_id < N_QUERIES)."""
    e = _with_norm(embeddings)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    pairs = q.crossJoin(e.select(F.col("vec_id").alias("c_id"), "v", "norm")).where(
        F.col("q_id") != F.col("c_id")
    )
    sim = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", "rank")
    )


def _bucket_key(vcol) -> F.Column:
    bits = [F.when(F.element_at(vcol, i + 1) >= 0, "1").otherwise("0") for i in range(SIGN_BITS)]
    return F.concat(*bits)


def ann_bucketed(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """Bucketed ANN: sign-key equi-join (scale path), top-k within bucket."""
    e = _with_norm(embeddings).withColumn("bucket", _bucket_key(F.col("v")))
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("norm").alias("qn"), "bucket"
    )
    cand = q.join(
        e.select(F.col("vec_id").alias("c_id"), "v", "norm", "bucket"), "bucket"
    ).where(F.col("q_id") != F.col("c_id"))
    sim = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", "rank")
    )


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Embedding-cosine near-dup pairs (label-blocked to bound the join)."""
    e = _with_norm(embeddings)
    a, b = e.alias("a"), e.alias("b")
    sim = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm")), 6
    )
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("sim", sim)
        .where(F.col("sim") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"), "sim"
        )
    )
