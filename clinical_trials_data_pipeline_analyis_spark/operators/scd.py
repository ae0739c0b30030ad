"""Slowly-changing-dimension (type 2) construction from change logs.

The reference's gold star schema is SCD1 — each dim row is the latest
state (``aact_gold_layer.sql:25-120``). At warehouse scale the standard
upgrade is SCD2: keep every historical attribute value with a validity
interval, so facts can join to the dimension *as of* their event time.
This module derives SCD2 rows from an append-only observation log (the
shape a CDC feed or event stream lands in) with pure window functions.

Scale shape: both windows are partitioned by the natural key — the
shuffle is one exchange on ``key_col`` and each partition holds one
entity's history (bounded), never the corpus. No global window, no
driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    log: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an observation log into SCD2 validity intervals.

    One input row = "entity ``key_col`` was observed with attribute
    ``attr_col`` at ``ts_col``" (``tiebreak_col`` makes the per-entity
    order total when timestamps tie). Output: one row per *change* —
    consecutive observations with the same attribute collapse into one
    interval:

    - ``valid_from``  — timestamp of the first observation of the value;
    - ``valid_to``    — next change's ``valid_from`` (NULL while open);
    - ``version``     — 1-based change counter per entity;
    - ``is_current``  — exactly one true row per entity.

    Attribute comparison is null-safe (NULL -> 'x' is a change, and so
    is 'x' -> NULL); the first observation per entity always opens
    version 1 even when its attribute is NULL, which a naive
    ``attr != lag(attr)`` filter would drop.
    """
    w_obs = Window.partitionBy(key_col).orderBy("valid_from", "_tie")
    obs = log.select(
        key_col,
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.col(tiebreak_col).alias("_tie"),
    ).withColumns(
        {
            "_rn": F.row_number().over(w_obs),
            "_prev": F.lag("attr").over(w_obs),
        }
    )
    changes = obs.filter(
        (F.col("_rn") == 1) | ~F.col("attr").eqNullSafe(F.col("_prev"))
    )
    w_chg = Window.partitionBy(key_col).orderBy("valid_from", "_tie")
    return changes.select(
        key_col,
        "attr",
        "valid_from",
        F.lead("valid_from").over(w_chg).alias("valid_to"),
        F.row_number().over(w_chg).cast("long").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content diff of two corpus snapshots: one row per document that
    was ``added``, ``removed``, or ``changed`` between ``old`` and
    ``new`` (unchanged documents are omitted — at corpus scale they are
    the overwhelming majority and carry no operational signal).

    The release-engineering primitive of a managed corpus: every
    shipped dataset version is diffed against its predecessor for the
    audit trail (what entered, what left, what mutated), and downstream
    incremental consumers re-process exactly the diff. Comparison is by
    md5 of the normalized text — a content identity, so reorderings of
    unchanged bytes don't report as churn.

    Returns (id_col, status, old_fp, new_fp), fingerprints NULL on the
    absent side.

    Scale shape: ONE full-outer shuffle join keyed by document id —
    both sides reduce to (id, 16-byte fingerprint) projections before
    the exchange, so the shuffle never carries text. Skewless by
    construction (ids are unique per side).
    """
    from ..functions.text import md5_fingerprint

    # Presence is decided by which SIDE of the full-outer join matched,
    # not by fingerprint nullness: a document whose text is NULL in both
    # snapshots has NULL fingerprints on both sides, and inferring
    # presence from the fingerprint would misreport it as "added" on
    # every diff. The explicit per-side flags make NULL-text documents
    # diff like any other content value (NULL = NULL → unchanged,
    # NULL vs text → changed).
    o = old.select(
        F.col(id_col),
        md5_fingerprint(F.col(text_col)).alias("old_fp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col),
        md5_fingerprint(F.col(text_col)).alias("new_fp"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed")
        )
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(id_col, "status", "old_fp", "new_fp")
    )
