#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline parse→enrich→route→
aggregate pipeline on the synthesized transcripts matching $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) at local[$SPARK_GRAFT_CPUS], prints ONE JSON line.

Pipeline shape = ictspark.pipeline.ReportSet (parse once → materialize
steps/runs/fails → nine yield-report aggregates → routed fan-out write), the
same shape the scaling protocol measures (scripts/scaling.py → BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from ictspark import io, parse
from ictspark import route as R
from ictspark.pipeline import ReportSet
from ictspark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    spark = get_spark(cpus=cpus, app="ictspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so stage timings reflect steady state, not first-job cost
    spark.range(1_000_000).select(F.sum("id")).collect()

    t = io.load_transcripts(spark, sf_dir)
    tool_dim, _ = io.load_dims(spark, sf_dir)
    n_turns = t.count()

    reps = int(os.environ.get("ICTSPARK_BENCH_REPS", "3"))  # noisy shared VM: best-of-3
    q: dict[str, float] = {}

    def run_once() -> dict[str, float]:
        r: dict[str, float] = {}

        def timed(name: str, fn) -> None:
            t0 = time.time()
            fn()
            r[name] = round(time.time() - t0, 3)

        rs = ReportSet(t, tool_dim)
        timed("materialize", rs.materialize)
        timed("yield_report", lambda: rs.yields().collect())
        timed("failure_counts", lambda: rs.failure_counts().count())
        timed("failures_by_index", lambda: rs.failures_by_index().count())
        timed("hourly_stats", lambda: rs.hourly_stats().count())
        timed("mb_results", lambda: rs.mb_results().count())
        timed("limit_changes", lambda: rs.limit_changes().collect())
        timed("first_fail", lambda: rs.first_fail().count())
        timed("failed_boards", lambda: rs.failed_boards().count())
        timed("route_counts", lambda: rs.route_counts().collect())
        # the product composite shares ONE materialized product_runs table
        # (r03: product_hourly pays the shuffle + persist; failed_boards reuses)
        prs = rs.product_reports()
        timed("product_daily_failures", lambda: prs["product_daily_failures"].count())
        timed("product_hourly", lambda: prs["product_hourly"].count())
        timed("product_failed_boards", lambda: prs["product_failed_boards"].count())
        tmp = tempfile.mkdtemp(prefix="ictspark_bench_")
        try:
            timed(
                "route_write",
                lambda: R.write_routed(
                    rs.enriched(), f"{tmp}/routed", files_per_partition=max(1, cpus // 4)
                ),
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        rs.unpersist()
        # cold single-pass parse with the Arrow UDF variant, for comparison
        timed("parse_arrow_variant", lambda: parse.parse_steps_arrow(t).count())
        return r

    # best-of-reps per stage: the sandbox host is a noisy shared VM
    for rr in [run_once() for _ in range(reps)]:
        for k, v in rr.items():
            q[k] = min(q.get(k, v), v)

    # 100 TB-critical extras (VERDICT r03 item 8): dedup/CC/ANN timings at the
    # same sf so round-over-round regressions in the LSH family are visible,
    # not just the yield reports. Timed once (cold) — these are batch curation
    # passes, not the steady-state pipeline; kept OUT of the headline e2e so
    # the metric stays comparable across rounds.
    from ictspark.extras import curation, dedup, similarity

    docs = io.load_table(spark, sf_dir, "documents")
    emb = io.load_table(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    extras: dict[str, float] = {}

    def timed_x(name: str, fn) -> None:
        t0 = time.time()
        fn()
        extras[name] = round(time.time() - t0, 3)

    timed_x("minhash_lsh_pairs", lambda: dedup.minhash_lsh_pairs(docs).count())
    timed_x("simhash_pairs", lambda: dedup.simhash_pairs(docs).count())

    def _components() -> None:
        labels = curation.dedup_components(docs)
        labels.count()
        labels.unpersist()  # caller contract: release the persisted labels

    timed_x("dedup_components", _components)
    timed_x("ann_bucketed", lambda: similarity.ann_bucketed(emb).count())
    timed_x(
        "embedding_dup_pairs_sized",
        lambda: similarity.embedding_dup_pairs(
            emb, threshold=0.8, n_vectors=n_vec, target_bucket=64
        ).count(),
    )
    timed_x("contamination_check", lambda: curation.contamination_check(docs).count())
    from ictspark.extras import textstats as TX

    timed_x("winnow_fingerprint", lambda: TX.winnow_fingerprint(docs).count())
    timed_x("winnow_reuse_pairs", lambda: dedup.winnow_reuse_pairs(docs).count())
    timed_x("unigram_logprob", lambda: TX.unigram_logprob(docs).count())
    timed_x("bigram_logprob", lambda: TX.bigram_logprob(docs).count())
    timed_x("semantic_keep_list", lambda: similarity.semantic_keep_list(emb).count())
    timed_x("gopher_rules", lambda: TX.gopher_rules(docs).count())
    timed_x(
        "nb_quality_score",
        lambda: TX.nb_quality_score(
            docs.where(F.col("doc_id") % 5 >= 2),
            docs.where(F.col("doc_id") % 5 == 0),
            docs.where(F.col("doc_id") % 5 == 1).select(
                "doc_id", F.reverse(F.lower("text")).alias("text")
            ),
        ).count(),
    )
    timed_x("paragraph_dedup", lambda: dedup.paragraph_dedup(docs).count())
    timed_x(
        "repeated_ngram_spans",
        lambda: dedup.repeated_ngram_spans(docs, k=8).count(),
    )
    timed_x(
        "decontaminate_spans",
        lambda: dedup.decontaminate_spans(
            docs.where(F.col("doc_id") >= 25), docs.where(F.col("doc_id") < 25), k=8
        ).count(),
    )
    timed_x(
        "dsir_weights",
        lambda: curation.dsir_weights(
            docs.where(F.col("doc_id") % 5 != 0), docs.where(F.col("doc_id") % 5 == 0)
        ).count(),
    )
    timed_x(
        "dsir_select",
        lambda: curation.dsir_select(
            docs.where(F.col("doc_id") % 5 != 0), docs.where(F.col("doc_id") % 5 == 0)
        ).count(),
    )
    timed_x(
        "decontaminate_fuzzy",
        lambda: dedup.decontaminate_fuzzy(
            docs.where(F.col("doc_id") >= 25), docs.where(F.col("doc_id") < 25)
        ).count(),
    )
    timed_x("curation_manifest", lambda: curation.curate_pipeline(docs).count())

    pipeline = round(sum(v for k, v in q.items() if k != "parse_arrow_variant"), 3)
    out = {
        "metric": "pipeline_e2e",
        "value": pipeline,
        "unit": "sec",
        "queries": q,
        "extras": extras,
        "sf": sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / pipeline, 1),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
