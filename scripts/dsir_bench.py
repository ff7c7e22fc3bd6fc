"""Scale evidence for the r09 incremental DSIR store (`extras.incr_dsir`).

N doc_id-striped sf1 raw batches against the frozen %5==0 target split —
per-batch ingest wall time must stay FLAT in store size (ingest is
O(batch): one text pass, two partition writes, the only stored bytes the
doc_id-pruned re-push guard), then the standing-read time (fold the
fixed-size bucket deltas + broadcast the ratio table over the stored
integer counts — no text), the equality digest vs the one-shot
`curation.dsir_weights` over the union raw corpus, and the steady-state
ratio (ingest+read per arrival vs a full one-shot recompute).

Usage: python scripts/dsir_bench.py [sf_name] [n_batches]   (default sf1 5)
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
from ictspark.extras import incr_dsir
from ictspark.extras.curation import dsir_weights
from ictspark.session import get_spark


def digest(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_feats").alias("nf"),
        F.bit_xor(F.xxhash64("doc_id", "n_feats", "logw")).alias("x"),
    ).first()
    return (r["n"], r["nf"], r["x"])


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app="ictspark-dsir-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warmup

    src = synth.ensure_documents(sf_name)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    target = docs.where(F.col("doc_id") % 5 == 0)
    raw = docs.where(F.col("doc_id") % 5 != 0)
    n_raw = raw.count()

    store = tempfile.mkdtemp(prefix="ictspark_dsir_bench_")
    t0 = time.time()
    incr_dsir.init_store(target, store)
    t_init = round(time.time() - t0, 2)

    batch_s, batch_feats = [], []
    for i in range(n_batches):
        # hash stripe, NOT doc_id % n_batches — that collides with the %5
        # target split whenever n_batches shares a factor with 5 (b000
        # would be empty at the default n_batches=5)
        b = raw.where(F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)) == i)
        t0 = time.time()
        st = incr_dsir.ingest_batch(b, store, f"b{i:03d}")
        batch_s.append(round(time.time() - t0, 2))
        batch_feats.append(st["n_feat_rows"])

    t0 = time.time()
    inc_digest = digest(incr_dsir.weights_read(spark, store))
    t_read = round(time.time() - t0, 2)

    t0 = time.time()
    one_digest = digest(dsir_weights(raw, target))
    t_oneshot = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "sf": sf_name,
                "n_raw_docs": n_raw,
                "cpus": cpus,
                "dsir_store": {
                    "init_s": t_init,
                    "batch_ingest_s": batch_s,
                    "batch_feat_rows": batch_feats,
                    "read_s": t_read,
                    "oneshot_s": t_oneshot,
                    "equal": inc_digest == one_digest,
                    "digest": list(inc_digest),
                    # steady-state: one arrival costs ingest(batch)+read vs
                    # a full one-shot recompute (which re-tokenizes the
                    # whole raw corpus) of the union
                    "steady_state_ratio": round(
                        (batch_s[-1] + t_read) / max(t_oneshot, 1e-9), 3
                    ),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
