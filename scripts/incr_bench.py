"""Incrementality evidence for the MinHash signature store (r07).

The claim extras/incremental.py makes: ingesting a NEW batch costs O(new ×
collision rate), not O(corpus) — because stored docs are never re-shingled,
never re-signatured, and never joined old-vs-old. This script ingests the
sf1 corpus (50k docs) in N equal doc_id-striped batches, times EACH ingest,
then times the one-shot ``full_recompute`` over the same corpus. The
steady-state ingest (the LAST batch: new batch vs the largest store) versus
the full recompute is the number a 100 TB operator cares about: it bounds
the per-arrival cost of keeping the keep-list current.

Usage: python scripts/incr_bench.py [sf_name] [n_batches]   (default sf1 5)
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
from ictspark.extras import incremental
from ictspark.session import get_spark


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app="ictspark-incr-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warmup

    src = synth.ensure_documents(sf_name)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    n = docs.count()

    store = tempfile.mkdtemp(prefix="ictspark_incr_bench_")
    batch_s: list[float] = []
    pair_counts: list[int] = []
    for i in range(n_batches):
        b = docs.where(F.col("doc_id") % n_batches == i)
        t0 = time.time()
        st = incremental.ingest_batch(b, store, f"b{i:03d}")
        batch_s.append(round(time.time() - t0, 2))
        pair_counts.append(st["n_new_pairs"])
    def keep_digest(df):
        """(count, doc_id sum, xxhash64 xor) of the kept SET — a set-level
        equality check, not just cardinality (code-review r07: equal counts
        can hide a merge in one place offset by a split in another)."""
        r = df.where("keep").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("s"),
            F.bit_xor(F.xxhash64("doc_id", "component")).alias("x"),
        ).first()
        return (r["n"], r["s"], r["x"])

    t0 = time.time()
    kl = incremental.keep_list(spark, store)
    d_incr = keep_digest(kl)
    read_s = round(time.time() - t0, 2)

    t0 = time.time()
    full = incremental.full_recompute(docs)
    d_full = keep_digest(full)
    full_s = round(time.time() - t0, 2)
    # the equality contract at this tier: same keeper SET and components
    assert d_incr == d_full, (d_incr, d_full)
    n_keep_incr = d_incr[0]

    out = {
        "metric": "incremental_dedup_ingest",
        "sf": sf_name,
        "docs": n,
        "n_batches": n_batches,
        "batch_s": batch_s,
        "new_pairs_per_batch": pair_counts,
        "keep_list_read_s": read_s,
        "full_recompute_s": full_s,
        "last_batch_vs_full": round(batch_s[-1] / full_s, 3),
        "n_keepers": n_keep_incr,
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
