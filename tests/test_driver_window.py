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

# The families the driver must verify this round: the modern
# LLM-pipeline surface (never driver-checked in rounds 1-3) and the §2
# headliners that carry unique SURVEY coverage.
_REQUIRED_IN_WINDOW = {
    # dedup pipeline / clustering
    "a21_dedup_cc_clusters",
    "a45_semantic_dedup",
    # PQ / IVFADC
    "a38_ivfpq_topk",
    "a43_ivfpq_residual_topk",
    # packing / curation / sampling
    "a40_curation_funnel",
    "a48_corpus_shuffle",
    # ANN quality loop
    "a49_ann_recall_at_k",
    # round-5 rotation: the three queries that had never had a driver
    # verdict (VERDICT r04 ask #1)
    "a50_cell_assign_rowlocal",
    "a51_pii_redaction",
    "a52_sliding_chunks",
    # round-5 additions: every newly-registered component must take its
    # driver verdict the round it lands
    "a53_rhp_embedding_neardup",
    "a54_dup_ngram_coverage",
    "a55_scd2_dimension",
    "a56_vocab_oov_rates",
    "a58_binned_quantiles",
    "a59_dup_spans",
    "a60_leakage_safe_split",
    "a62_linear_count_distinct",
    "a63_bm25_topk",
    "a64_bpe_pair_counts",
    "a65_hybrid_rrf",
    "a66_dsir_importance",
    "a67_cms_heavy_hitters",
    "a68_retention_curve",
    "a69_bigram_lm_scores",
    "a70_ivfadc_rerank",
    "a72_pagerank_copurchase",
    "a73_bloom_decontaminate",
    "a74_event_funnel",
    "a75_cohort_retention",
    "a76_canonical_by_centrality",
    "a77_snapshot_diff",
    "a79_skew_safe_distinct",
    "a80_dup_cap",
    "a81_lang_confusion",
    "a82_latest_event_argmax",
    "a83_weighted_sample",
    "a84_source_dup_report",
    # round-6 additions: every newly-registered component must take its
    # driver verdict the round it lands
    "a85_bpe_encode",
    "a86_hll_distinct",
    "a87_dedup_span_removal",
    "a88_perceptron_langfilter",
    "a89_perceptron_scores",
    # round-6 freshness rotation (VERDICT r05 ask #7): stale §2
    # headliners rotated back into the window
    "q09_window_dedup",
    "q10_star_role_playing_dates",
    "x05_dedup_minhash_lsh",
    "x15_multimodal_metadata",
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
