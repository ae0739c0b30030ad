"""BM25 lexical retrieval over a document corpus.

The retrieval surface of a training-data / RAG pipeline: score documents
against keyword queries with Okapi BM25 (Robertson & Walker, SIGIR '94;
the idf form is the "plus one" variant used by Lucene) and return the
top-k documents per query.

100 TB shape
------------
The corpus-side statistics are one token explode + one shuffle on
(doc_id, term) — the same single pass that builds an inverted index.
Everything query-side is broadcast: the query-term table (|queries| x
|terms|, KBs) semi-probes the exploded tokens BEFORE the tf shuffle,
so every exchange after the scan carries only postings of queried
terms — cost is governed by the posting-list sizes of the query
vocabulary, not corpus size. Per-document length is size(tokens),
computed row-locally and carried through the tf shuffle, so there is
no doc-keyed join anywhere in the plan. The corpus-level scalar
statistics (N, avgdl) arrive as a broadcast one-row aggregate, never a
driver collect. Final top-k is a per-query window, pre-reduced by
WindowGroupLimit before the exchange.

Exactness discipline: each per-term contribution is rounded to 6 dp and
summed as DECIMAL(18,6), so the (query, doc) score is bit-identical
across engines regardless of addition order; ranking orders by that
exact decimal with a doc_id tiebreak.

Reference analog: the reference repo's search surface is SQL ILIKE
scans (aact_silver_layer.sql:417-530 mapping joins on normalized
names); BM25 is the scaled-up form of "find the studies matching these
terms, best first".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text, whitespace_tokens

#: BM25 hyperparameters (Lucene defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_contribution(
    tf: Column, df: Column, dl: Column, n_docs: Column, avgdl: Column,
    k1: float = BM25_K1, b: float = BM25_B,
) -> Column:
    """Per-(term, doc) BM25 contribution, rounded to 6 dp.

    Operand order is pinned so the DuckDB oracle can reproduce the exact
    double: ln(1 + (N - df + 0.5)/(df + 0.5)) * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl)).
    """
    idf = F.log(
        F.lit(1.0) + (n_docs - df.cast("double") + F.lit(0.5)) / (df.cast("double") + F.lit(0.5))
    )
    num = tf.cast("double") * F.lit(k1 + 1.0)
    den = tf.cast("double") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / avgdl
    )
    return F.round(idf * num / den, 6)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``queries`` is a small (query_id BIGINT, term STRING) table — one row
    per query term; it is broadcast twice (once as the term semi-probe,
    once for the scoring join). Documents with no matching term simply
    don't appear (standard retrieval semantics).

    Returns (query_id, doc_id, n_terms_matched, score, rank), rank 1..k
    per query ordered by the exact decimal score DESC, doc_id ASC.
    """
    # Document length is size(tokens) — computed ROW-LOCALLY before the
    # explode and carried through the tf shuffle as max(dl), so no
    # posting-side re-aggregation and no dl join back on doc_id.
    base = docs.select(
        F.col(id_col),
        whitespace_tokens(normalized_text(F.col(text_col))).alias("toks"),
    )
    # Corpus scalars in ONE aggregate pass: N over ALL documents
    # (zero-token docs count toward N and pull avgdl down, as in
    # Lucene), total length as sum(size(tokens)).
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.size("toks")).cast("double").alias("total_dl"),
    ).select("n_docs", (F.col("total_dl") / F.col("n_docs")).alias("avgdl"))

    toks = base.select(
        id_col, F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    # Probe the postings with the (broadcast) query vocabulary BEFORE
    # the tf shuffle, so every downstream exchange carries only postings
    # of queried terms.
    vocab = queries.select("term").distinct()
    tf = (
        toks.join(F.broadcast(vocab), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    # Document frequency as a count window over the tf rows (one row per
    # (doc, term), so the per-term count IS df). A groupBy+join would
    # recompute the whole tf branch for the df side — the window reuses
    # the single tf shuffle and only re-exchanges the (query-vocabulary-
    # sized) postings by term. Applied BEFORE the queries join: a term
    # shared by two queries must not double-count df.
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )

    scored = (
        tf.join(F.broadcast(queries), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            F.col(id_col),
            bm25_contribution(
                F.col("tf"), F.col("df"), F.col("dl"),
                F.col("n_docs"), F.col("avgdl"), k1=k1, b=b,
            ).cast("decimal(18,6)").alias("contrib"),
        )
    )
    per_doc = scored.groupBy("query_id", id_col).agg(
        F.sum("contrib").alias("score_dec"),
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_dec"), F.asc(id_col)
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            "n_terms_matched",
            F.col("score_dec").cast("double").alias("score"),
            "rank",
        )
    )


def bm25_topk_oracle_sql(
    query_terms: list[tuple[int, str]],
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    norm_sql: str = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))",
) -> str:
    """DuckDB oracle for :func:`bm25_topk` over the ``documents`` view,
    interpolated from the SAME hyperparameters and query-term list so the
    two sides cannot drift."""
    values = ", ".join(f"({qid}, '{term}')" for qid, term in query_terms)
    return f"""
WITH q(query_id, term) AS (VALUES {values}),
toks AS (
    SELECT doc_id, unnest(string_split({norm_sql}, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks WHERE term <> '' GROUP BY doc_id, term
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (
    SELECT
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
        (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
            / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS avgdl
),
tf_q AS (SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM q) v USING (term)),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf_q GROUP BY term),
scored AS (
    SELECT
        q.query_id,
        tf_q.doc_id,
        CAST(ROUND(
            ln(1.0 + (stats.n_docs - CAST(df.df AS DOUBLE) + 0.5)
                     / (CAST(df.df AS DOUBLE) + 0.5))
            * (CAST(tf_q.tf AS DOUBLE) * {k1 + 1.0!r})
            / (CAST(tf_q.tf AS DOUBLE)
               + {k1!r} * ({1.0 - b!r} + {b!r} * CAST(dl.dl AS DOUBLE) / stats.avgdl)),
        6) AS DECIMAL(18,6)) AS contrib
    FROM tf_q
    JOIN q USING (term)
    JOIN df USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
),
per_doc AS (
    SELECT query_id, doc_id,
           SUM(contrib) AS score_dec,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched
    FROM scored GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_terms_matched,
       CAST(score_dec AS DOUBLE) AS score,
       CAST(rank AS BIGINT) AS rank
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score_dec DESC, doc_id
    ) AS rank
    FROM per_doc
)
WHERE rank <= {k}
"""


def rrf_fuse(
    ranked: DataFrame,
    k0: int = 60,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of any number of ranked candidate lists.

    ``ranked`` is the union of per-system rankings (query_col, id_col,
    rank_col) — one row per (system, query, candidate). RRF needs only
    RANKS, never the systems' incomparable raw scores, which is exactly
    why it's the standard lexical+semantic fusion: rrf(d) = sum over
    systems of 1/(k0 + rank_s(d)).

    Scale shape: the inputs are already top-k-per-query tables
    (|queries| x k x systems rows — tiny regardless of corpus size), so
    fusion costs one hash aggregation and one per-query window on a
    table that never grows with the corpus.

    Each contribution is rounded to 6 dp and summed as DECIMAL(18,6)
    (engine-exact, addition-order-free); final rank orders by the exact
    decimal, id ascending. Returns (query_col, id_col, n_systems,
    rrf_score, rank), rank 1..k.
    """
    contrib = F.round(
        F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double")), 6
    ).cast("decimal(18,6)")
    fused = (
        ranked.select(query_col, id_col, contrib.alias("contrib"))
        .groupBy(query_col, id_col)
        .agg(
            F.sum("contrib").alias("rrf_dec"),
            F.count(F.lit(1)).cast("long").alias("n_systems"),
        )
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf_dec"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            query_col,
            id_col,
            "n_systems",
            F.col("rrf_dec").cast("double").alias("rrf_score"),
            "rank",
        )
    )
