"""Round-11 additions: the large-k flat-dot opt-in on the SemDeDup
coarse assign (bit-identity + the auto rule), per the 2.5M-rung finding
that |corpus| x k assign dots dominate once k ∝ n.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from clinical_trials_data_pipeline_analyis_spark.operators import similarity
from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
    ivf_assign,
    semantic_dedup,
)

_DIM = 64


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ivf_assign_flat_is_bit_identical(spark):
    """use_flat routes only the cross-term dot through the flat codegen
    form — same left-assoc float order, so every (centroid_id, cosine)
    must be EXACTLY equal, not approximately."""
    emb = _emb(spark)
    cent = emb.filter(F.col("vec_id") % 97 == 0)
    key = lambda r: (r["vec_id"], r["centroid_id"], r["cosine"])
    fold = sorted(map(key, ivf_assign(emb, cent, dim=_DIM).collect()))
    flat = sorted(
        map(key, ivf_assign(emb, cent, dim=_DIM, use_flat=True).collect())
    )
    assert fold == flat


def test_semantic_dedup_auto_flat_rule(spark, monkeypatch):
    """Past IVF_ASSIGN_FLAT_MIN_K centroids semantic_dedup flips the
    assign to flat; results must be identical to the fold path. The
    fixture's centroid set is small, so the threshold is lowered to
    force the flat branch rather than synthesizing 512 centroids."""
    emb = _emb(spark)
    cent = emb.filter(F.col("vec_id") % 97 == 0)
    k = cent.count()
    assert k < similarity.IVF_ASSIGN_FLAT_MIN_K  # default path = fold
    key = lambda r: (r["vec_id"], r["component"], r["cos_centroid"], r["kept"])
    fold = sorted(map(key, semantic_dedup(emb, cent, 0.95, dim=_DIM).collect()))
    monkeypatch.setattr(similarity, "IVF_ASSIGN_FLAT_MIN_K", k)  # binds now
    flat = sorted(map(key, semantic_dedup(emb, cent, 0.95, dim=_DIM).collect()))
    assert fold == flat


# ---------------------------------------------------------------------
# Data-aware RHP band escalation (the 5M-rung refusal: rhp_auto_bits'
# n-only law under-sizes on clustered corpora — measured 1.16e9
# candidates vs the 500M budget at 17-bit bands; auto mode now probes
# the actual candidate mass and widens until it fits).
# ---------------------------------------------------------------------
from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (  # noqa: E402
    rhp_candidate_estimate,
    rhp_escalate_bits,
    rhp_near_duplicates,
    rhp_signatures,
)


def test_rhp_candidate_estimate_matches_bucket_math(spark):
    """The narrow estimate must equal Σ n(n−1)/2 over the bucket sizes
    of the SAME geometry's signature table, computed independently."""
    emb = _emb(spark)
    est = rhp_candidate_estimate(emb, 8, 2, dim=_DIM)
    sizes = (
        rhp_signatures(emb, 8, 2, dim=_DIM)
        .groupBy("band", "band_sig")
        .count()
        .collect()
    )
    expected = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
    assert est == expected and est > 0


def test_rhp_escalate_bits_fits_the_budget(spark):
    """Starting from deliberately under-sized 1-bit bands (2 buckets per
    band — nearly all-pairs), escalation must widen until the measured
    candidate mass fits the budget, and the returned geometry's
    estimate must actually fit."""
    emb = _emb(spark)
    n = emb.count()
    budget = max(50, n // 2)  # far below the 1-bit all-pairs mass
    chosen = rhp_escalate_bits(
        emb, 2, 2, max_candidates=budget, dim=_DIM
    )
    assert chosen > 2 and chosen % 2 == 0
    assert rhp_candidate_estimate(emb, chosen, 2, dim=_DIM) <= budget


def test_rhp_auto_escalation_completes_and_matches_pinned(spark):
    """An auto call whose initial law-sized geometry exceeds the budget
    must COMPLETE (not refuse) and return exactly the pinned result at
    the escalated width — auto is sizing, never semantics.

    The threshold sits BELOW the fixture's cosine range (max pairwise
    cosine ≈ 0.479 — ADVICE r11: at 0.8 both sides were empty and the
    equality was vacuous), so the compared result sets are non-empty
    and the identity is exercised on real rows. The law's starting
    geometry is asserted explicitly: target_bucket=2n puts the raw law
    at 1-bit bands, but rhp_auto_bits floors at min_band_bits=8, so
    the escalation starts from 8-bit bands (16 total), not 1-bit."""
    from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
        rhp_auto_bits,
    )

    emb = _emb(spark)
    n = emb.count()
    budget = max(50, n // 2)
    assert rhp_auto_bits(n, bands=2, target_bucket=2 * n) == 16  # 8-bit floor
    # Same 16-bit law start as the auto call, so both walk the same
    # probe sequence and land on the same escalated width.
    chosen = rhp_escalate_bits(
        emb, 16, 2, max_candidates=budget, dim=_DIM
    )
    assert chosen > 16  # the fixture's mass escalates past the law
    key = lambda r: (r["vec_a"], r["vec_b"], r["cosine"])  # noqa: E731
    auto = sorted(
        map(
            key,
            rhp_near_duplicates(
                emb, 0.3, n_bits="auto", bands=2, dim=_DIM,
                max_candidates=budget, target_bucket=2 * n,
            ).collect(),
        )
    )
    pinned = sorted(
        map(
            key,
            rhp_near_duplicates(
                emb, 0.3, n_bits=chosen, bands=2, dim=_DIM,
                max_candidates=budget,
            ).collect(),
        )
    )
    assert auto and auto == pinned


def test_rhp_pinned_refusal_unchanged(spark):
    """A pinned-int call past the budget must still refuse loudly with
    the bits-growth prescription — escalation is auto-mode only."""
    import pytest

    emb = _emb(spark)
    with pytest.raises(ValueError, match="under-sized for this corpus"):
        rhp_near_duplicates(
            emb, 0.8, n_bits=2, bands=2, dim=_DIM, max_candidates=50
        ).count()


def test_rhp_escalate_bits_stops_at_ceiling(spark):
    """An unsatisfiable budget (0) must stop at max_band_bits, not loop:
    exact-dup collisions survive any width, so some corpora can never
    fit an arbitrarily small budget and the ceiling is the exit."""
    emb = _emb(spark)
    chosen = rhp_escalate_bits(
        emb, 2, 2, max_candidates=0, dim=_DIM, max_band_bits=3
    )
    assert chosen == 6  # 2 bands x 3-bit ceiling
