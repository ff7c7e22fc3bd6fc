"""Driver-contract invariants: the CORRECTNESS harness records only the FIRST
50 queries() entries, so the window composition is load-bearing (VERDICT r02
item 1) — this test fails if a future edit pushes a scale-critical operator
out of the window."""

import __spark_entry__ as E

SCALE_CRITICAL = {
    # bucketed dedup / ANN / curation / multimodal — the 100 TB paths
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "dedup_exact",
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


def test_scale_critical_queries_inside_driver_window():
    window = list(E.queries())[:50]
    missing = SCALE_CRITICAL - set(window)
    assert not missing, f"scale-critical queries outside the 50-entry window: {missing}"


def test_every_query_has_an_oracle():
    qs = set(E.queries())
    osql = set(E.oracle_sql())
    assert qs <= osql, f"queries without oracles: {qs - osql}"


def test_no_duplicate_query_names():
    names = list(E.queries())
    assert len(names) == len(set(names))
