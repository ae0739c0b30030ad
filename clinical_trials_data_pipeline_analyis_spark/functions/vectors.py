"""Vector math over ``array<float>`` embedding columns.

Built on ``zip_with`` / ``aggregate`` higher-order functions: the fold is
ordered and evaluated JVM-side, so results are deterministic (no
partition-order float-sum nondeterminism) and identical to a row-local SQL
computation — which keeps the DuckDB oracles exact after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL cosine (instead of an
    # ANSI-mode DIVIDE_BY_ZERO error) — downstream rankings order NULL
    # last with a deterministic id tiebreak.
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
