"""Vector math over ``array<float>`` embedding columns.

Built on ``zip_with`` / ``aggregate`` higher-order functions: the fold is
ordered and evaluated JVM-side, so results are deterministic (no
partition-order float-sum nondeterminism) and identical to a row-local SQL
computation — which keeps the DuckDB oracles exact after rounding.

Fixed-dimension fast path: Spark's higher-order functions are evaluated
outside whole-stage codegen (interpreted lambda per element, plus a
``zip_with`` array allocation per pair), which makes ``dot`` the dominant
cost of every pair scan. When the caller knows the expected embedding
width, ``dot(a, b, dim=64)`` emits a flat
``a[0]*b[0] + ... + a[63]*b[63]`` expression instead — plain codegen'd
arithmetic over primitive array reads, no intermediate array. The flat sum
associates exactly like the fold (``((0.0 + p0) + p1) + ...`` with
``0.0 + p0 == p0``), so the IEEE result is bit-identical for arrays of
length ``dim``; rows whose arrays are any OTHER length take a per-row
CASE branch back to the interpreted fold — ``dim`` is therefore purely a
performance hint, never a semantic change, and every caller/oracle pair
stays value-exact regardless of the hint's accuracy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dot_fold(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Ordered float dot product; see module docstring for the ``dim``
    fast path (bit-identical — a per-row size guard falls back to the
    fold for rows that are not ``dim`` wide)."""
    if dim is None:
        return _dot_fold(a, b)
    flat: Column = F.lit(0.0)
    for i in range(dim):
        flat = flat + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return F.when(
        (F.size(a) == F.lit(dim)) & (F.size(b) == F.lit(dim)), flat
    ).otherwise(_dot_fold(a, b))


def _norm_sq_fold(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    """Ordered L2 norm; ``dim`` selects the same flat codegen form as
    ``dot``, with the same per-row fallback (norms are per-vector, not
    per-pair, so this matters less — but pre-join norm columns sit on
    the scan side of wide joins)."""
    if dim is None:
        return F.sqrt(_norm_sq_fold(a))
    flat: Column = F.lit(0.0)
    for i in range(dim):
        x = F.get(a, i).cast("double")
        flat = flat + x * x
    return F.sqrt(
        F.when(F.size(a) == F.lit(dim), flat).otherwise(_norm_sq_fold(a))
    )


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    # try_divide: a zero-norm vector yields NULL cosine (instead of an
    # ANSI-mode DIVIDE_BY_ZERO error) — downstream rankings order NULL
    # last with a deterministic id tiebreak.
    return F.try_divide(
        dot(a, b, dim=dim), l2_norm(a, dim=dim) * l2_norm(b, dim=dim)
    )
