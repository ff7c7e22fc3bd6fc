#!/usr/bin/env python
"""Round-10 optimization profiler (guide §1): times individual queries with
the noop sink (computation only, no sink cost), best/median of N reps, and
optionally dumps .explain("formatted") to plans/r10/<name>_<tag>.txt.

Usage:
    python scripts/prof_r10.py [--reps N] [--plans TAG] [query ...]

Separate from the FROZEN bench.py (driver contract) — numbers here feed
OPTIMIZATION_r10.md, not the driver metric.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ictspark import io
from ictspark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_queries(spark, sf_dir):
    """name -> zero-arg callable returning a DataFrame (or running an action)."""
    from ictspark import parse
    from ictspark import route as R
    from ictspark.pipeline import ReportSet
    from ictspark.extras import curation, dedup, similarity
    from ictspark.extras import textstats as TX

    docs = io.load_table(spark, sf_dir, "documents")
    emb = io.load_table(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    t = io.load_transcripts(spark, sf_dir)

    q = {
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(docs),
        "simhash_pairs": lambda: dedup.simhash_pairs(docs),
        "ann_bucketed": lambda: similarity.ann_bucketed(emb),
        "embedding_dup_pairs_sized": lambda: similarity.embedding_dup_pairs(
            emb, threshold=0.8, n_vectors=n_vec, target_bucket=64
        ),
        "embedding_dup_pairs": lambda: similarity.embedding_dup_pairs(emb),
        "contamination_check": lambda: curation.contamination_check(docs),
        "winnow_fingerprint": lambda: TX.winnow_fingerprint(docs),
        "winnow_reuse_pairs": lambda: dedup.winnow_reuse_pairs(docs),
        "unigram_logprob": lambda: TX.unigram_logprob(docs),
        "bigram_logprob": lambda: TX.bigram_logprob(docs),
        "semantic_keep_list": lambda: similarity.semantic_keep_list(emb),
        "gopher_rules": lambda: TX.gopher_rules(docs),
        "nb_quality_score": lambda: TX.nb_quality_score(
            docs.where(F.col("doc_id") % 5 >= 2),
            docs.where(F.col("doc_id") % 5 == 0),
            docs.where(F.col("doc_id") % 5 == 1).select(
                "doc_id", F.reverse(F.lower("text")).alias("text")
            ),
        ),
        "paragraph_dedup": lambda: dedup.paragraph_dedup(docs),
        "repeated_ngram_spans": lambda: dedup.repeated_ngram_spans(docs, k=8),
        "decontaminate_spans": lambda: dedup.decontaminate_spans(
            docs.where(F.col("doc_id") >= 25), docs.where(F.col("doc_id") < 25), k=8
        ),
        "dsir_weights": lambda: curation.dsir_weights(
            docs.where(F.col("doc_id") % 5 != 0), docs.where(F.col("doc_id") % 5 == 0)
        ),
        "dsir_select": lambda: curation.dsir_select(
            docs.where(F.col("doc_id") % 5 != 0), docs.where(F.col("doc_id") % 5 == 0)
        ),
        "decontaminate_fuzzy": lambda: dedup.decontaminate_fuzzy(
            docs.where(F.col("doc_id") >= 25), docs.where(F.col("doc_id") < 25)
        ),
        "curation_manifest": lambda: curation.curate_pipeline(docs),
        "parse_steps": lambda: parse.parse_steps(t),
        "parse_arrow_variant": lambda: parse.parse_steps_arrow(t),
        # non-DataFrame actions (return None → timed as-is)
        "dedup_components": lambda: _components(curation, docs),
        "reportset": lambda: _reportset(t, sf_dir, spark),
        "route_write": lambda: _route_write(R, t, sf_dir, spark),
    }
    return q


def _components(curation, docs):
    labels = curation.dedup_components(docs)
    labels.count()
    labels.unpersist()


def _reportset(t, sf_dir, spark):
    from ictspark.pipeline import ReportSet

    tool_dim, _ = io.load_dims(spark, sf_dir)
    rs = ReportSet(t, tool_dim)
    rs.materialize()
    rs.unpersist()


def _route_write(R, t, sf_dir, spark):
    import shutil
    import tempfile

    from ictspark import parse
    from ictspark import aggregates as A
    from ictspark import enrich

    tool_dim, _ = io.load_dims(spark, sf_dir)
    sa = A.with_attempt(parse.parse_steps(t))
    tmp = tempfile.mkdtemp(prefix="prof_route_")
    try:
        R.write_routed(enrich.enrich_steps(sa, tool_dim), f"{tmp}/routed", files_per_partition=8)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain to plans/r10/<name>_<TAG>.txt")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app="ictspark-prof-r10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warmup

    qs = build_queries(spark, sf_dir)
    names = args.queries or list(qs)
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"prof:{name}")
        times = []
        for i in range(args.reps):
            t0 = time.time()
            r = fn()
            if r is not None:
                r.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        if args.plans:
            r = fn()
            if r is not None:
                p = os.path.join(REPO, "plans", "r10", f"{name}_{args.plans}.txt")
                with open(p, "w") as fh:
                    fh.write(r._sc._jvm.PythonSQLUtils.explainString(
                        r._jdf.queryExecution(), "formatted"))
        out[name] = {"min": min(times), "med": statistics.median(times), "all": times}
        print(json.dumps({name: out[name], "load": os.getloadavg()[0]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
