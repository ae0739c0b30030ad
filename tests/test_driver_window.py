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

# The families the driver must verify this round (round 8): every
# component whose CODE/parameters changed since its last driver verdict,
# the freshness rotation, and the standing LLM-pipeline surface.
_REQUIRED_IN_WINDOW = {
    # round-8: changed-parameter queries taking their driver verdict
    # the round the change lands (VERDICT r7 asks #1/#2 — a53 12-bit
    # bands, x07 max_df bound; x08's operator gained the dim guard +
    # ordered diagnostics, so it stays for a fresh verdict too)
    "a53_rhp_embedding_neardup",
    "x07_dedup_ngram_jaccard",
    "x08_dedup_embedding_cosine",
    # round-8 freshness rotation (VERDICT r7 ask #5): stale names last
    # driver-green r2-r4
    "q01_pricing_summary",
    "q02_priority_frequency_topk",
    "q03_mapping_standardize",
    "q04_category_case_chain",
    "q05_best_priority_agg",
    "q08_surrogate_dim",
    "x02_doc_fingerprint",
    "x03_token_count",
    "x04_text_quality",
    # round-8: simhash hot-bucket cap (generator + oracle changed)
    "a23_dedup_simhash_pairs",
    "a26_dedup_simhash_verified",
    # round-8: ANN query-set cap (a38/a43 in-window carry it too)
    "a33_pq_adc_topk",
    "a32_pq_encode",
    # round-7 entrants with a single green verdict — keep one more round
    "a90_perceptron_wide",
    "x15_multimodal_metadata",
    "a86_hll_distinct",
    "q07_date_spine",
    "q12_scalar_qa_bounds",
    "q18_token_truncate",
    "x01_dedup_exact",
    "x06_dedup_simhash",
    "x09_ann_cosine_topk",
    "q28_correlated_subquery",
    # standing LLM-pipeline surface (a45's operator gained the optional
    # max_cell guard this round — default off, plan unchanged, but it
    # stays in-window for a fresh verdict anyway)
    "a21_dedup_cc_clusters",
    "a45_semantic_dedup",
    "a38_ivfpq_topk",
    "a43_ivfpq_residual_topk",
    "a40_curation_funnel",
    "x16_ann_ivf_topk",
    "a52_sliding_chunks",
    "a54_dup_ngram_coverage",
    "a56_vocab_oov_rates",
    "a58_binned_quantiles",
    "a59_dup_spans",
    "a60_leakage_safe_split",
    "a63_bm25_topk",
    "a64_bpe_pair_counts",
    "a65_hybrid_rrf",
    "a66_dsir_importance",
    "a67_cms_heavy_hitters",
    "a68_retention_curve",
    "a69_bigram_lm_scores",
    "a73_bloom_decontaminate",
    "a75_cohort_retention",
    "a76_canonical_by_centrality",
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
