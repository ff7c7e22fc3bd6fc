"""Driver-contract invariants: the CORRECTNESS harness records only the FIRST
50 queries() entries, so the window composition is load-bearing (VERDICT r02
item 1) — this test fails if a future edit pushes a scale-critical operator
out of the window before it has accumulated independent driver-green rounds."""

import glob
import json
import os

import __spark_entry__ as E

SCALE_CRITICAL = {
    # bucketed dedup / ANN / curation / multimodal — the 100 TB paths
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "dedup_components",
    "stratified_sample",
    "top_terms_per_lang",
    "length_percentiles",
    "scrub_stats",
    "ann_bruteforce",
    "ann_bucketed",
    "ann_multiprobe",
    "ann_ivf",
    "embedding_dup_pairs",
    "embedding_quantize",
    "media_stats",
    "frame_sample_plan",
    "media_featurize",
    # core pipeline flagships
    "parse_steps",
    "yield_report",
    "first_fail",
    "route_counts",
    "product_hourly",
    "product_daily_failures",
    "product_failed_boards",
}


# The EXACT r06 window (ADVICE r03: pin the full 50-entry list, not just a
# subset, so any insertion/reorder that silently changes what the driver
# grades is loud). Rotation is deliberate and happens HERE, per round.
# r06 fills the window by accumulated-green count ascending over
# CORRECTNESS_r01..r05: 8 never-graded (six r05 additions +
# curation_manifest + training_order), 8 once-green r05 debutants, all 25
# twice-green, 8 thrice-green in registry order — PLUS minhash_lsh_pairs,
# whose definition changed in r06 (threshold-derived sizing + one-md5
# integer hash family), so its prior greens no longer attest the code.
R06_WINDOW = [
    "bigram_logprob", "semantic_dup_pairs", "semantic_keep_list",
    "pack_sequences", "mixture_plan", "tool_chain_stats", "curation_manifest",
    "export_matrix_vertical", "repetition_score", "events_day_0600",
    "tpch_q1like", "tpch_q5like", "parts_by_brand", "top_customers",
    "events_sessionize", "product_workbook", "limit_regime_asof",
    "error_bursts", "tool_latency", "winnow_fingerprint", "winnow_reuse_pairs",
    "unigram_logprob", "dedup_keep_list", "corpus_mix", "contamination_check",
    "ann_quantized_rerank", "embedding_norm_stats", "media_dedup",
    "mb_result_boxes", "events_hourly", "events_shift_buckets",
    "dedup_components", "stratified_sample", "top_terms_per_lang",
    "length_percentiles", "scrub_stats", "ann_multiprobe", "ann_ivf",
    "embedding_quantize", "media_featurize", "export_matrix_failed",
    "export_matrix_final_run", "tool_call_stats", "tool_call_args_hist",
    "retest_marker_parity", "reassembly_check", "conv_turn_stats",
    "conv_reports", "training_order", "minhash_lsh_pairs",
]


def _driver_green_rounds(name: str) -> int:
    """Count of past driver rounds where `name` was graded fully green."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = 0
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rec = json.load(open(p)).get(name)
        if rec and rec.get("hash_match") and not rec.get("err"):
            n += 1
    return n


def test_scale_critical_queries_graded_or_proven():
    """Every scale-critical operator must either sit inside the 50-entry
    driver window or already hold ≥ 2 independent driver-green rounds —
    rotation may move a proven operator to the parity-only tail (VERDICT r04
    item 5), but never an unproven one."""
    window = set(list(E.queries())[:50])
    weak = [
        n
        for n in SCALE_CRITICAL
        if n not in window and _driver_green_rounds(n) < 2
    ]
    assert not weak, f"scale-critical queries neither windowed nor twice-green: {weak}"


def test_exact_driver_window_pinned():
    assert list(E.queries())[:50] == R06_WINDOW


def test_every_query_has_an_oracle():
    qs = set(E.queries())
    osql = set(E.oracle_sql())
    assert qs <= osql, f"queries without oracles: {qs - osql}"


def test_no_duplicate_query_names():
    names = list(E.queries())
    assert len(names) == len(set(names))
