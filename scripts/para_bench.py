"""Scale evidence for the r09 sub-document dedup family.

1. Incremental paragraph store (`extras.incr_para`): N doc_id-striped sf1
   batches — per-batch ingest wall time must stay FLAT in store size
   (ingest is O(batch): one text pass + three partition writes, NO stored
   read), then the standing-read time and the equality digest vs the
   one-shot `dedup.paragraph_dedup` over the union corpus, and the
   steady-state ratio (ingest+read vs one-shot recompute per arrival).
2. `dedup.repeated_ngram_spans` one-shot at the same tier — wall time +
   duplicate-mass stats, the k-gram exact-substring stage's cost anchor.

Usage: python scripts/para_bench.py [sf_name] [n_batches]   (default sf1 5)
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
from ictspark.extras import incr_para
from ictspark.extras.dedup import paragraph_dedup, repeated_ngram_spans
from ictspark.session import get_spark


def digest(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_removed").alias("rm"),
        F.bit_xor(F.xxhash64("doc_id", "n_removed", "new_text")).alias("x"),
    ).first()
    return (r["n"], r["rm"], r["x"])


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app="ictspark-para-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warmup

    src = synth.ensure_documents(sf_name)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    n = docs.count()

    store = tempfile.mkdtemp(prefix="ictspark_para_bench_")
    batch_s, batch_occ = [], []
    for i in range(n_batches):
        b = docs.where(F.col("doc_id") % n_batches == i)
        t0 = time.time()
        st = incr_para.ingest_batch(b, store, f"b{i:03d}")
        batch_s.append(round(time.time() - t0, 2))
        batch_occ.append(st["n_occurrences"])

    t0 = time.time()
    inc_digest = digest(incr_para.paradedup_read(spark, store))
    t_read = round(time.time() - t0, 2)

    t0 = time.time()
    one_digest = digest(paragraph_dedup(docs))
    t_oneshot = round(time.time() - t0, 2)

    t0 = time.time()
    spans = repeated_ngram_spans(docs, k=8)
    sp = spans.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum((F.col("removed_tokens") > 0).cast("int")).alias("touched"),
        F.sum("removed_tokens").alias("rm_tok"),
        F.sum("n_tokens").alias("tot_tok"),
    ).first()
    t_spans = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "sf": sf_name,
                "n_docs": n,
                "cpus": cpus,
                "para_store": {
                    "batch_ingest_s": batch_s,
                    "batch_occurrences": batch_occ,
                    "read_s": t_read,
                    "oneshot_s": t_oneshot,
                    "equal": inc_digest == one_digest,
                    "digest": list(inc_digest),
                    # steady-state: one arrival costs ingest(batch)+read vs
                    # a full one-shot recompute of the union
                    "steady_state_ratio": round(
                        (batch_s[-1] + t_read) / max(t_oneshot, 1e-9), 3
                    ),
                },
                "repeated_ngram_spans": {
                    "wall_s": t_spans,
                    "docs_touched": sp["touched"],
                    "tokens_removed": sp["rm_tok"],
                    "tokens_total": sp["tot_tok"],
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()


