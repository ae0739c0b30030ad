"""In-engine trainable linear classifier: BATCH PERCEPTRON over hashed
bag-of-token features, integer-exact.

The quality/language filters of an LLM data pipeline (fastText-style
linear models over token features — Joulin et al. 2017; CCNet and most
curation stacks train exactly this shape) are usually trained OUTSIDE
the engine and imported as scores. This trains the model inside the
engine with nothing but joins and aggregates, which matters at 100 TB
because the training data never leaves the cluster.

Why the batch perceptron (Rosenblatt 1958, batch variant) and not
logistic regression: the update rule is

    w_{t+1}(b) = w_t(b) + sum over misclassified docs of y * x(b)

— pure INTEGER arithmetic when features are token counts. No sigmoid,
no learning-rate float, no float accumulation order: every iteration is
bit-identical across engines, partitionings, and SQL dialects, so the
trained weights themselves are value-oracled (the same discipline as
the fixed-point PageRank in `operators/graph.py`). Mistake-bound theory
guarantees convergence on linearly separable data; on real corpora a
few iterations give a usable separator (tested).

Scale shape per iteration: the model is a FIXED-SIZE table (``buckets``
rows — corpus-independent, the round-6 cap discipline), so the
score join broadcasts the model against the feature table (one
map-side hash join, no shuffle of the corpus), the per-doc score is one
map-side-combinable aggregate keyed by doc, and the weight update is
one aggregate keyed by bucket (<= ``buckets`` groups). Driver holds
nothing; iterations chain lazily with localCheckpoint lineage cuts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..checkpoint import cut_lineage


def token_features(
    docs: DataFrame,
    label_expr,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
) -> DataFrame:
    """(id, y, bucket, cnt): hashed bag-of-tokens features with an
    integer label in {-1, +1} from ``label_expr`` (a boolean Column —
    True -> +1). The md5 bucket is the engine-portable hash idiom, so
    features (and therefore the whole training run) reproduce exactly
    in SQL."""
    from ..functions.text import bpe_ish_tokens, normalized_text
    from .sampling import hash_bucket

    toks = docs.select(
        F.col(id_col),
        F.when(label_expr, 1).otherwise(-1).cast("long").alias("y"),
        F.explode(
            bpe_ish_tokens(normalized_text(F.col(text_col)))
        ).alias("token"),
    )
    return toks.groupBy(
        id_col,
        "y",
        hash_bucket(F.col("token"), buckets).cast("long").alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


#: fastText's published scale point is a 10-dim model over up to 10M
#: hashed n-gram buckets (Joulin et al. 2017 §2, "Bag of tricks for
#: efficient text classification"). 2^16 is this engine's default wide
#: width: 65,536 (bucket, weight) longs is ~1 MB serialized — a model
#: that broadcasts as a REAL payload rather than a few bytes, while
#: staying far under any executor broadcast ceiling.
WIDE_BUCKETS = 65536


def token_ngram_features(
    docs: DataFrame,
    label_expr,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = WIDE_BUCKETS,
) -> DataFrame:
    """(id, y, bucket, cnt) over hashed UNIGRAM + WORD-BIGRAM features —
    the fastText feature map (Joulin et al. 2017 hash word n-grams
    precisely to grow the feature space past the unigram vocabulary).
    Same contract as ``token_features``, wider space: adjacent-token
    bigrams join the bag before hashing, so the occupied model width
    scales with vocab² rather than vocab. Row-local array ops build the
    bigrams (no extra shuffle vs the unigram path); the md5 bucket keeps
    every feature engine-portable for the SQL oracle."""
    from ..functions.text import bpe_ish_tokens, normalized_text
    from .sampling import hash_bucket

    base = docs.select(
        F.col(id_col),
        F.when(label_expr, 1).otherwise(-1).cast("long").alias("y"),
        bpe_ish_tokens(normalized_text(F.col(text_col))).alias("_toks"),
    )
    bigrams = F.transform(
        F.slice(
            F.col("_toks"), 1, F.greatest(F.size("_toks") - 1, F.lit(0))
        ),
        lambda x, i: F.concat(
            x, F.lit("_"), F.element_at(F.col("_toks"), i + 2)
        ),
    )
    toks = base.select(
        id_col,
        "y",
        F.explode(F.concat(F.col("_toks"), bigrams)).alias("token"),
    )
    return toks.groupBy(
        id_col,
        "y",
        hash_bucket(F.col("token"), buckets).cast("long").alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def batch_perceptron(
    features: DataFrame,
    iters: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Train ``iters`` batch-perceptron iterations over a
    (id, y, bucket, cnt) feature table; returns the weight table
    (bucket, weight) — integer-exact, identical on any engine that
    replays the same updates.

    w_0 = 0, so iteration 1's update is the class-weighted feature sum
    (every doc is misclassified at score 0 under the ``y*score <= 0``
    mistake rule, ties count as mistakes as in the classic perceptron).
    """
    feats = features.select(
        F.col(id_col).alias("_id"), "y", "bucket", "cnt"
    ).transform(cut_lineage())

    # w1: every doc misclassified at w0 = 0
    w = feats.groupBy("bucket").agg(
        F.sum(F.col("y") * F.col("cnt")).cast("long").alias("weight")
    )
    for _ in range(iters - 1):
        # Lazy truncation (round 14): w is referenced twice per epoch
        # (the broadcast in scores and the full_outer merge), so the
        # lineage cut is mandatory — but the blocks can materialize
        # inside the first job that needs them instead of paying an
        # eager per-epoch job for a <=buckets-row frame. Values
        # unchanged.
        w = w.transform(cut_lineage(eager=False))
        scores = (
            feats.join(F.broadcast(w), "bucket", "left")
            .groupBy("_id", "y")
            .agg(
                F.sum(
                    F.col("cnt") * F.coalesce(F.col("weight"), F.lit(0))
                ).alias("score")
            )
        )
        mis = scores.filter(F.col("y") * F.col("score") <= 0).select("_id")
        delta = (
            feats.join(mis, "_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("cnt")).cast("long").alias("_d"))
        )
        w = (
            w.join(delta, "bucket", "full_outer")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("weight"), F.lit(0))
                    + F.coalesce(F.col("_d"), F.lit(0))
                )
                .cast("long")
                .alias("weight"),
            )
        )
    return w


def perceptron_scores(
    features: DataFrame, weights: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, y, score, predicted): apply a weight table — the inference
    half; one broadcast join + per-doc aggregate, the same shape every
    curation filter pass uses."""
    return (
        features.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col, "y")
        .agg(
            F.sum(F.col("cnt") * F.coalesce(F.col("weight"), F.lit(0)))
            .cast("long")
            .alias("score")
        )
        .withColumn(
            "predicted",
            F.when(F.col("score") > 0, 1).otherwise(-1).cast("long"),
        )
    )
