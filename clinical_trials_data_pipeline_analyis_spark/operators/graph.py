"""Graph centrality over entity-link graphs: fixed-point PageRank.

Ranking nodes of a relationship graph (co-purchase, co-citation,
near-duplicate similarity) is the standard way to pick CANONICAL
entities — "of these near-duplicate clusters, keep the most central
representative", "which parts are hubs of the co-order graph". The
connected-components operator (``operators/dedup.py``) answers "what
belongs together"; PageRank answers "what matters inside".

Exactness discipline — fixed-point integers, not floats: iterative
float PageRank is partition-order nondeterministic (double sums over
neighbor messages) and drifts across engines. Here rank mass is BIGINT
parts-per-billion: contributions are ``rank DIV degree`` (integral
division, identically defined in Spark ``DIV`` and DuckDB ``//`` for
non-negative operands), message sums are exact integer sums, and the
damping step is ``(damping_pct * msum) DIV 100``. Every iteration is
bit-identical on any partitioning, any engine — the property that
makes a 5-iteration run oracle-checkable. Ranks approximate true
PageRank to ~1e-9 per step, far below any ranking-relevant delta.

100 TB shape
------------
Per iteration: one shuffle keyed by source node (join ranks to edges)
and one partial-aggregated shuffle keyed by destination. State is one
BIGINT per edge-incident node; lineage is truncated per round with a
``localCheckpoint`` exactly like the CC loop. Degree and node count are
computed once. No driver-side collect — the node count enters the plan
as a broadcast one-row aggregate.

Reference analog: `aact_gold_layer.sql:300-349` (opportunity_rank)
scores rows by a FIXED weighted formula; PageRank is the graph-
conditioned version where a row's weight comes from its neighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..checkpoint import cut_lineage

#: Fixed-point scale: ranks are parts-per-billion of total mass.
PAGERANK_SCALE = 1_000_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, degree, rank_ppb) after ``iterations`` rounds of
    fixed-point PageRank over the UNDIRECTED graph of ``edges``.

    Edges are symmetrized and deduplicated; only edge-incident nodes
    participate (isolated nodes have no relational evidence to rank).
    ``damping_pct`` is the damping factor in percent (85 = the classic
    0.85). Initial rank is ``SCALE DIV n``; each round::

        rank' = (100 - damping_pct) * SCALE DIV 100 DIV n
              + damping_pct * (sum over in-neighbors of rank DIV degree) DIV 100

    All arithmetic is BIGINT, so results are deterministic and
    engine-portable (see module docstring).
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .transform(cut_lineage(eager=False))
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    # base is the iteration-CONSTANT frame (node, degree, _n): each
    # round's new ranks join onto it, so the evolving ranks frame is
    # referenced exactly ONCE per iteration (in contrib) and the logical
    # plan grows LINEARLY in iterations. The previous shape joined msgs
    # back onto ranks itself (two references per round — exponential
    # plan growth) and therefore had to localCheckpoint EVERY round;
    # each of those checkpoints forced a full Catalyst+codegen pass at
    # construction time (round 14 measured 6 planning passes = ~4.5s of
    # the a72 query's 5.1s at sf0.1, with the actual data work under
    # 0.1s). With linear growth one truncation every few rounds bounds
    # both plan size and failure-recovery replay; values are identical
    # (same integer arithmetic, same join shapes).
    base = deg.crossJoin(F.broadcast(n_nodes)).transform(
        cut_lineage(eager=False)
    )
    ranks = base.select(
        "node",
        "degree",
        F.expr(f"CAST({PAGERANK_SCALE} AS BIGINT) DIV _n").alias("rank_ppb"),
    )
    for i in range(iterations):
        contrib = ranks.select(
            F.col("node").alias("a"),
            F.expr("rank_ppb DIV degree").alias("_c"),
        )
        msgs = (
            sym.join(contrib, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("_c").cast("long").alias("_msum"))
        )
        ranks = base.join(msgs, "node", "left").select(
            "node",
            "degree",
            (
                F.expr(
                    f"CAST({(100 - damping_pct) * PAGERANK_SCALE // 100} AS BIGINT) DIV _n"
                )
                + F.expr(
                    f"CAST({damping_pct} AS BIGINT) * coalesce(_msum, CAST(0 AS BIGINT)) DIV 100"
                )
            ).alias("rank_ppb"),
        )
        if (i + 1) % 3 == 0 and (i + 1) < iterations:
            # Bound lineage depth for long runs without paying a
            # planning pass per round.
            ranks = ranks.transform(cut_lineage(eager=False))
    return ranks.select("node", "degree", "rank_ppb")


def pagerank_iteration_ctes(
    iterations: int = 5, damping_pct: int = 85
) -> str:
    """The deg/nn/it0..itN CTE chain of the fixed-point iteration,
    assuming a CTE named ``sym(a, b)`` (symmetrized, self-loop-free,
    deduplicated edges) is already in scope — embeddable into larger
    oracles (e.g. CC + centrality compositions). The final CTE is
    ``it{iterations}(node, degree, rank_ppb)``."""
    base = (100 - damping_pct) * PAGERANK_SCALE // 100
    parts = [
        f"""deg AS (
    SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM sym GROUP BY a
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
it0 AS (
    SELECT node, degree, CAST({PAGERANK_SCALE} AS BIGINT) // n AS rank_ppb
    FROM deg, nn
)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""it{i} AS (
    SELECT d.node, d.degree,
           CAST({base} AS BIGINT) // nn.n
           + CAST({damping_pct} AS BIGINT) * COALESCE(m.msum, 0) // 100
               AS rank_ppb
    FROM deg AS d
    LEFT JOIN (
        SELECT s.b AS node, CAST(SUM(r.rank_ppb // r.degree) AS BIGINT) AS msum
        FROM sym AS s JOIN it{i - 1} AS r ON s.a = r.node
        GROUP BY s.b
    ) AS m ON m.node = d.node, nn
)"""
        )
    return ",\n".join(parts)


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping_pct: int = 85,
) -> str:
    """DuckDB oracle for :func:`pagerank_fixed_point`: the iteration
    unrolled as chained CTEs, generated from the SAME constants.
    ``edges_sql`` must select columns ``src, dst``."""
    chain = pagerank_iteration_ctes(iterations, damping_pct)
    return f"""WITH edges_in AS ({edges_sql}),
sym AS (
    SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM edges_in
        UNION ALL
        SELECT dst AS a, src AS b FROM edges_in
    ) WHERE a <> b
),
{chain}
SELECT node, degree, rank_ppb FROM it{iterations}"""
