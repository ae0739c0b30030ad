"""Guard the driver-window contract (VERDICT r03 ask #6).

The driver's correctness gate records verdicts for the FIRST 50 entries
of ``queries()`` in iteration order (r01-r03 evidence: each CORRECTNESS
artifact is exactly the first 50 names in registration order). These
tests make any rename/reorder that would silently move a query out of
the checked window fail loudly instead.
"""

from __future__ import annotations

from clinical_trials_data_pipeline_analyis_spark.suite import (
    DRIVER_WINDOW,
    registry,
)

# The families the driver must verify this round (round 10): every
# component whose CODE/parameters changed since its last driver verdict,
# the freshness rotation, and the standing LLM-pipeline surface.
_REQUIRED_IN_WINDOW = {
    # round-10: changed-code queries taking their driver verdict the
    # round the change lands — quantize_embeddings dropped its input
    # repartition (a29 creep adjudication; values bit-identical, plan
    # now exchange-free)
    "a29_embedding_quantize",
    # round-10 freshness rotation (VERDICT r9 ask #3): stale names last
    # driver-green r2-r4, oldest-first, plus the two adjudicated rows
    "q11_duration_parse",
    "q13_percentile_caps",
    "q14_count_distinct",
    "q15_cohort_counts",
    "q16_having_filter",
    "q17_exclusion_filters",
    "q19_normalized_key_join",
    "q20_yoy_growth",
    "x11_text_langid",
    "x12_events_hourly_window",
    "a31_ann_ivf_multiprobe",
    # round-10 second wave: x17's plan changed (estimate-in-join) so it
    # owes a fresh verdict under the changed-component rule — it was
    # also r2-r4-stale, as were the seven riding along
    "x17_dedup_minhash_estimate",
    "q21_set_operations",
    "q22_semi_anti_join",
    "x13_events_sessionize",
    "x14_events_json_props",
    "a27_multimodal_resize",
    "a28_multimodal_frames",
    "a36_stratified_sample",
    # standing LLM-pipeline surface
    "a21_dedup_cc_clusters",
    "x07_dedup_ngram_jaccard",
    "x08_dedup_embedding_cosine",
    "a53_rhp_embedding_neardup",
    "a45_semantic_dedup",
    "a38_ivfpq_topk",
    "a43_ivfpq_residual_topk",
    "a40_curation_funnel",
    "a52_sliding_chunks",
    "a56_vocab_oov_rates",
    "a58_binned_quantiles",
    "a59_dup_spans",
    "a64_bpe_pair_counts",
    "a65_hybrid_rrf",
    "a69_bigram_lm_scores",
    "a73_bloom_decontaminate",
    "a76_canonical_by_centrality",
    "a90_perceptron_wide",
    "a26_dedup_simhash_verified",
    "x06_dedup_simhash",
    "x15_multimodal_metadata",
    "a86_hll_distinct",
    "x01_dedup_exact",
    # §2 flagship
    "q06_opportunity_rank",
}


def test_window_is_exactly_the_first_50_registered():
    names = list(registry())
    assert tuple(names[:50]) == DRIVER_WINDOW


def test_window_has_no_duplicates_and_size_50():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_required_families_inside_window():
    missing = _REQUIRED_IN_WINDOW - set(DRIVER_WINDOW)
    assert not missing, f"driver window lost required queries: {missing}"


def test_every_window_query_has_value_oracle():
    """Window entries must get the STRONG (hash) verdict, not rows-only."""
    reg = registry()
    weak = [n for n in DRIVER_WINDOW if reg[n].oracle is None]
    assert not weak, f"window queries without a value oracle: {weak}"


def test_rotated_out_queries_remain_registered():
    """Rotated-out queries (q07/q12/q18 in round 5; q22-q30 and x01-x20
    since round 4) must stay registered (locally oracle-checked by
    test_oracle_parity)."""
    names = set(registry())
    expected = (
        {f"q{i:02d}" for i in range(22, 31)}
        | {f"x{i:02d}" for i in range(1, 21)}
        | {"q03", "q07", "q08", "q09", "q10", "q11", "q12", "q18",
           "q19", "q20", "a22", "a29", "a23", "a24", "a27", "a28", "a31", "a32", "a33", "a36", "a41", "a42", "a44", "a46", "a47"}
    )
    got_prefixes = {n.split("_", 1)[0] for n in names}
    assert expected <= got_prefixes
