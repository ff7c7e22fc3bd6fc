"""Documents-side adversarial-skew stress (VERDICT r06 item 6) — the
curation-family companion to scripts/skew_bench.py.

The transcripts pipeline proved its hot-conv defenses; the curation family's
designed defenses are the TWO-PHASE bucket ranks (corpus_mix / mixture_plan /
training_order / pack_sequences — no whole-language or whole-source window)
and the shingle df-caps. This script plants the corresponding nightmare
corpus: ONE language carrying ~90 % of all documents and ONE source carrying
~90 % (deterministic remap of the lang/source columns only — text unchanged,
so tokenize/shingle work is identical and the ratio isolates key-distribution
effects), on top of the synthesizer's existing hot boilerplate phrase. The
IDENTICAL workload — the full curate_pipeline manifest, the global
training-order shuffle, and the mixture plan — runs on uniform vs skewed
input in the same session.

Acceptance (the transcripts-stress bar): skew/uniform e2e within ~1.2×.

Usage: python scripts/doc_skew_bench.py [sf_name]   (default sf1)
Prints one JSON line; paste it into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ictspark import synth
from ictspark.extras import curation
from ictspark.session import get_spark

HOT_PCT = 90  # % of docs remapped into the hot lang AND the hot source
HOT_LANG = "en"
HOT_SOURCE = "src0"


def skewed_variant(spark, sf_name: str):
    """Deterministic remap: ~HOT_PCT% of docs (hash-chosen) get lang=HOT_LANG
    and source=HOT_SOURCE; text/doc_id untouched. Written once to disk so
    both variants read parquet (same scan cost)."""
    out = os.path.join(synth.SYNTH_ROOT, f"{sf_name}docskew")
    dpath = os.path.join(out, "documents.parquet")
    meta_path = os.path.join(out, "_skew_meta.json")
    meta = {"hot_pct": HOT_PCT, "hot_lang": HOT_LANG, "hot_source": HOT_SOURCE}
    fresh = False
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            fresh = json.load(f) == meta  # stale constants force a rebuild
            # (code-review r07: dir-existence-only caching silently
            # benchmarked old data after a constant edit)
    if not (fresh and os.path.isdir(dpath)):
        os.makedirs(out, exist_ok=True)
        src = synth.ensure_documents(sf_name)
        d = spark.read.parquet(os.path.join(src, "documents.parquet"))
        hot = F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(100)) < HOT_PCT
        d2 = d.select(
            "doc_id",
            "text",
            F.when(hot, F.lit(HOT_LANG)).otherwise(F.col("lang")).alias("lang"),
            F.when(hot, F.lit(HOT_SOURCE)).otherwise(F.col("source")).alias("source"),
            "n_chars",
        )
        d2.repartition(8).write.mode("overwrite").parquet(dpath)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
    return spark.read.parquet(dpath)


def run_workload(docs) -> float:
    """The curation-family body: full manifest chain + global shuffle order +
    mixture plan. Counts force full materialization."""
    t0 = time.time()
    curation.curate_pipeline(docs).count()
    curation.training_order(docs).count()
    curation.mixture_plan(docs).count()
    return time.time() - t0


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app="ictspark-doc-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warmup

    src = synth.ensure_documents(sf_name)
    uniform = spark.read.parquet(os.path.join(src, "documents.parquet"))
    skewed = skewed_variant(spark, sf_name)
    n = uniform.count()
    assert skewed.count() == n  # remap relabels, never adds/drops
    hot_docs = skewed.where(F.col("lang") == HOT_LANG).count()

    # one THROWAWAY pass first: the initial curate_pipeline invocation pays
    # one-time codegen/checkpoint-setup costs that would otherwise land
    # entirely on whichever variant runs first (observed 46 s cold vs 22 s
    # warm for the SAME input); then alternate variants so residual session
    # drift cancels rather than biasing one side
    run_workload(uniform)
    reps = int(os.environ.get("ICTSPARK_BENCH_REPS", "2"))
    us, ss = [], []
    for _ in range(reps):
        us.append(run_workload(uniform))
        ss.append(run_workload(skewed))
    u, s = min(us), min(ss)
    out = {
        "metric": "doc_skew_stress_e2e",
        "sf": sf_name,
        "docs": n,
        "hot_lang_share": round(hot_docs / n, 4),
        "uniform_s": round(u, 2),
        "skew_s": round(s, 2),
        "ratio": round(s / u, 3),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
