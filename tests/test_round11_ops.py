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
