"""Corpus n-gram language-model scoring (perplexity-style filtering).

The quality-filter move popularized by CCNet (Wenzek et al., LREC 2020)
and used by most pretraining pipelines: score every document under a
language model trained on the corpus itself (or a trusted subset), and
filter/bucket by the score. Real CCNet uses a KenLM 5-gram; the
distributed form here is an add-alpha-smoothed BIGRAM model whose
"training" and "inference" are both single SQL-shaped passes, which is
exactly what scales — the model IS a DataFrame.

Per-document score::

    total_nll = sum over adjacent token pairs (w1, w2) of
                round(-ln((c(w1,w2) + a) / (c(w1) + a*V)), 6)

with corpus bigram counts c(w1,w2), unigram counts c(w1), vocabulary
size V and smoothing ``alpha``. Lower total per bigram = more fluent
under the corpus model.

100 TB shape
------------
Three aggregates, all partial-agg friendly: per-(doc, bigram) counts
(the only corpus-sized shuffle), corpus bigram counts derived from it
(shuffle carries DISTINCT bigrams, never token instances — same
discipline as ``operators/repetition.py``), and unigram counts. The
unigram table joins the bigram table on ``w1`` (vocab-sized equi-join),
and the enriched model joins back to per-doc pairs on (w1, w2) — a
shuffle equi-join on n-gram keys with no broadcast of anything
corpus-dependent except the one-row vocabulary size. Nothing is
collected; the "model" never leaves the cluster.

Exactness discipline: the per-bigram NLL is rounded to 6 dp, cast to
DECIMAL(18,6), and per-document totals are decimal sums of
(count x nll), bit-identical across engines regardless of order.

Reference analog: the reference's enrollment outlier caps
(aact_silver_layer.sql:255-264) are fixed plausibility scores; the LM
score is the corpus-conditioned generalization — "how plausible is this
row given everything else we ingested".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..checkpoint import cut_lineage

from ..functions.text import normalized_text, whitespace_tokens

#: Default add-alpha smoothing mass.
LM_ALPHA = 0.5


def _doc_bigrams(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2, cnt): per-document adjacent-pair counts, built
    row-locally (slice+zip, no posexplode self-join)."""
    toks = docs.select(
        F.col(id_col),
        whitespace_tokens(normalized_text(F.col(text_col))).alias("toks"),
    )
    pairs = toks.filter(F.size("toks") >= 2).select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1).alias("w1"),
                F.slice("toks", 2, F.size("toks") - 1).alias("w2"),
            )
        ).alias("p"),
    )
    return (
        pairs.select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def bigram_lm_scores(
    docs: DataFrame,
    alpha: float = LM_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = False,
) -> DataFrame:
    """(doc_id, n_bigrams, total_nll): score each document under the
    corpus's own add-alpha bigram model. Documents with fewer than two
    tokens have no bigrams and do not appear (standard LM-filter
    semantics — they are handled by length filters, not perplexity).

    The per-(doc, bigram) table feeds both the corpus model aggregate
    and the scoring join, and the unigram table feeds both the model
    join and the vocabulary count. ``materialize=False`` (default)
    leaves dedup of those repeated subtrees to Catalyst's exchange
    reuse — measured FASTER at bench scale (8.5s vs 10.0s on the 50k
    fixture; a lazy localCheckpoint only breaks stage pipelining
    there, see BASELINE.md round-5 notes). ``materialize=True``
    lineage-truncates both tables with lazy ``localCheckpoint``s — the
    guarantee (not just an optimizer rule) that each action tokenizes
    the corpus exactly twice, for callers whose plans grow past
    exchange-reuse reliability or who score repeatedly.
    """
    doc_pairs = _doc_bigrams(docs, id_col, text_col)
    if materialize:
        doc_pairs = doc_pairs.transform(cut_lineage(eager=False))
    bigrams = doc_pairs.groupBy("w1", "w2").agg(
        F.sum("cnt").cast("long").alias("c12")
    )
    unigrams = (
        docs.select(
            F.explode(
                whitespace_tokens(normalized_text(F.col(text_col)))
            ).alias("w1")
        )
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    if materialize:
        unigrams = unigrams.transform(cut_lineage(eager=False))
    vocab = unigrams.agg(
        F.count(F.lit(1)).cast("double").alias("v_size")
    )
    model = (
        bigrams.join(unigrams, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    (F.col("c12").cast("double") + F.lit(alpha))
                    / (F.col("c1").cast("double") + F.lit(alpha) * F.col("v_size"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("nll"),
        )
    )
    return (
        doc_pairs.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("nll")).alias("_nll_dec"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.col("_nll_dec").cast("double").alias("total_nll"),
        )
    )


def bigram_lm_oracle_sql(norm_sql: str, alpha: float = LM_ALPHA) -> str:
    """DuckDB oracle for :func:`bigram_lm_scores` over the ``documents``
    view, interpolated from the same ``alpha``."""
    return f"""
WITH toklists AS (
    SELECT doc_id,
           list_filter(string_split({norm_sql}, ' '), t -> t <> '') AS toks
    FROM documents
),
doc_pairs AS (
    SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toklists,
         LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) t
    WHERE len(toks) >= 2
    GROUP BY doc_id, toks[i], toks[i + 1]
),
bigrams AS (
    SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c12
    FROM doc_pairs GROUP BY w1, w2
),
unigrams AS (
    SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
        SELECT unnest(toks) AS w1 FROM toklists
    ) GROUP BY w1
),
vocab AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v_size FROM unigrams),
model AS (
    SELECT b.w1, b.w2,
           CAST(ROUND(
               -ln((CAST(b.c12 AS DOUBLE) + {alpha})
                   / (CAST(u.c1 AS DOUBLE) + {alpha} * v.v_size)),
           6) AS DECIMAL(18,6)) AS nll
    FROM bigrams b JOIN unigrams u USING (w1), vocab v
)
SELECT dp.doc_id,
       CAST(SUM(dp.cnt) AS BIGINT) AS n_bigrams,
       CAST(SUM(dp.cnt * m.nll) AS DOUBLE) AS total_nll
FROM doc_pairs dp JOIN model m USING (w1, w2)
GROUP BY dp.doc_id
"""
