"""Incrementality evidence for the semantic assignment store (VERDICT r07
item 6's bench criterion): per-batch ingest cost must stay FLAT as the
store grows, because (a) assignment is O(batch × K) regardless of store
size, and (b) the within-cluster pair join's stored side is pruned to the
cluster buckets the batch touches and scattered before the broadcast-probe
join. The growing term is the genuine new-vs-stored pair OUTPUT.

Runs the sf1 embeddings tier (20k 64-dim vectors) as N vec_id-striped
batches with pinned fixed centroids, then the one-shot semantic_keep_list
for the steady-state ratio and a set-level equality assert.

Usage: python scripts/sem_incr_bench.py [sf_name] [n_batches]
Prints one JSON line; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ictspark import synth
from ictspark.extras import incr_semantic, similarity
from ictspark.session import get_spark


def digest(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vec_id").alias("s"),
        F.bit_xor(F.xxhash64("vec_id", "cent_id", "keep")).alias("x"),
    ).first()
    return (r["n"], r["s"], r["x"])


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app="ictspark-sem-incr-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warmup

    src = synth.ensure_embeddings(sf_name)
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    n = emb.count()
    cents = similarity.fixed_centroids(emb)

    store = tempfile.mkdtemp(prefix="ictspark_sem_bench_")
    batches = []
    for i in range(n_batches):
        b = emb.where(F.col("vec_id") % n_batches == i)
        t0 = time.time()
        st = incr_semantic.ingest_vectors(b, store, f"b{i:03d}", centroids=cents)
        batches.append(
            {
                "s": round(time.time() - t0, 2),
                "vecs": st["n_vecs"],
                "new_pairs": st["n_new_pairs"],
                "read_mb": round(st["read_bytes_stored"] / 1e6, 2),
                "t_assign_s": st["t_assign_s"],
                "t_pairs_s": st["t_pairs_s"],
            }
        )
        print(f"batch {i}: {batches[-1]}", file=sys.stderr, flush=True)

    t0 = time.time()
    kl = incr_semantic.semantic_keep_read(spark, store)
    d_incr = digest(kl)
    read_s = round(time.time() - t0, 2)

    t0 = time.time()
    full = similarity.semantic_keep_list(emb, centroids=cents)
    d_full = digest(full)
    full_s = round(time.time() - t0, 2)
    assert d_incr == d_full, (d_incr, d_full)

    out = {
        "metric": "incremental_semantic_ingest",
        "sf": sf_name,
        "vectors": n,
        "n_batches": n_batches,
        "batches": batches,
        "keep_read_s": read_s,
        "one_shot_s": full_s,
        "last_batch_vs_one_shot": round(batches[-1]["s"] / full_s, 3),
        "n_kept": int(kl.where("keep = 1").count()),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
