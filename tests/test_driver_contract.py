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


# The EXACT r09 window (ADVICE r03: pin the full 50-entry list, not just a
# subset, so any insertion/reorder that silently changes what the driver
# grades is loud). Rotation is deliberate and happens HERE, per round.
# r09 fills the window by accumulated-green count ascending over
# CORRECTNESS_r01..r08: the thirteen r09 additions lead (0-green by
# construction — repeated_ngram_spans, paragraph_dedup_incremental,
# the three dsir entries, the two decontaminate entries, paragraph_dedup and the
# gopher/subword manifest entries), then the four once-green r08
# additions, the 4 twice-green, the 8 thrice-green (the
# manifest/mixture/pack family re-attests after the
# tokenizer/para_dedup/empty-input changes; the two incremental stores
# re-attest after the empty-batch and rep-mode changes), and the leading
# four-green in registry order up to the 50-cap.
R09_WINDOW = [
    "repeated_ngram_spans", "repeated_ngram_spans_incremental",
    "paragraph_dedup_incremental", "dsir_weights",
    "dsir_weights_incremental", "dsir_select", "dsir_select_incremental",
    "decontaminate_spans",
    "decontaminate_fuzzy",
    "paragraph_dedup", "curation_manifest_gopher", "curation_manifest_subword",
    "curation_manifest_incremental_gopher", "gopher_rules",
    "curation_manifest_incremental", "semantic_dedup_incremental",
    "nb_quality_score", "prototypicality", "dedup_incremental",
    "lm_score_reference", "mixture_plan_subword", "bigram_logprob",
    "semantic_dup_pairs", "semantic_keep_list", "pack_sequences",
    "mixture_plan", "tool_chain_stats", "curation_manifest", "training_order",
    "export_matrix_vertical", "repetition_score", "events_day_0600",
    "tpch_q1like", "tpch_q5like", "parts_by_brand", "top_customers",
    "events_sessionize", "lang_id", "step_series", "step_histogram",
    "step_cpk_trend", "failed_boards_display", "product_hourly",
    "product_daily_failures", "product_failed_boards", "ann_bruteforce",
    "ann_bucketed", "embedding_dup_pairs", "media_stats", "frame_sample_plan",
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
    assert list(E.queries())[:50] == R09_WINDOW


def test_every_query_has_an_oracle():
    qs = set(E.queries())
    osql = set(E.oracle_sql())
    assert qs <= osql, f"queries without oracles: {qs - osql}"


def test_no_duplicate_query_names():
    names = list(E.queries())
    assert len(names) == len(set(names))
