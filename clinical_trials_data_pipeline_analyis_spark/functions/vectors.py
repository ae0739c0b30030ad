"""Vector math over ``array<float>`` embedding columns.

Built on ``zip_with`` / ``aggregate`` higher-order functions: the fold is
ordered and evaluated JVM-side, so results are deterministic (no
partition-order float-sum nondeterminism) and identical to a row-local SQL
computation — which keeps the DuckDB oracles exact after rounding.

``dim`` hint — a measured NEGATIVE result, kept off. Round 8 tried a
fixed-dimension "fast path": with ``dim=64``, ``dot`` emitted a flat
codegen'd ``a[0]*b[0] + ... + a[63]*b[63]`` (bit-identical to the fold:
same left-assoc IEEE order, per-row size-guard falling back to the fold),
on the theory that higher-order functions are interpreted per element
while flat arithmetic rides whole-stage codegen. Measured on the real
queries, the flat form LOST at every scale:

- sf0.1 (2k vectors): a31 5.3s flat vs 1.7s fold; a49 4.0 vs 1.2;
  x16 2.9 vs 1.2; x10 2.2 vs 0.7; x09 2.2 vs 0.6; a24 2.6 vs 1.2
  (steady-state, repeated fresh plans, quiet host).
- sf10 (500k vectors): x10 10.7s flat vs 2.0s fold; x09 7.4 vs 3.3.

Mechanism: one 64-term dot inlines to a ~500-node CASE WHEN projection.
The generated stage blows past JIT/codegen method limits, so the whole
stage — scan included — degrades to interpreted per-row expression
evaluation (a ~500-virtual-call tree walk per row), while every fresh
plan also re-pays ~1s of Janino compilation on the megabyte-scale
source. The fold, by contrast, is one specialized evaluator loop the JIT
compiles once. A 48-dot-per-row variant (rhp_signatures) measured 9x
slower flat — the first symptom that led to re-measuring the family.

The flat construction is retained below behind ``_FLAT_DIM_ENABLED``
(default False) so the bit-identity property stays under test
(tests/test_vectors_dim.py) and the negative result stays reproducible;
``dim`` is accepted everywhere as an inert hint so call sites did not
churn. Do not flip the default without re-measuring BOTH scales.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default False — see module docstring: the flat form measured 2-5x
#: SLOWER than the fold at sf0.1 AND sf10. Tests flip this to keep the
#: bit-identity proof live.
_FLAT_DIM_ENABLED = False


def _dot_fold(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_flat(a: Column, b: Column, dim: int) -> Column:
    flat: Column = F.lit(0.0)
    for i in range(dim):
        flat = flat + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return F.when(
        (F.size(a) == F.lit(dim)) & (F.size(b) == F.lit(dim)), flat
    ).otherwise(_dot_fold(a, b))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Ordered float dot product. ``dim`` is an inert hint unless
    ``_FLAT_DIM_ENABLED`` (see module docstring — measured slower when
    on, bit-identical either way)."""
    if dim is not None and _FLAT_DIM_ENABLED:
        return _dot_flat(a, b, dim)
    return _dot_fold(a, b)


def _norm_sq_fold(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_sq_flat(a: Column, dim: int) -> Column:
    flat: Column = F.lit(0.0)
    for i in range(dim):
        x = F.get(a, i).cast("double")
        flat = flat + x * x
    return F.when(F.size(a) == F.lit(dim), flat).otherwise(_norm_sq_fold(a))


def l2_norm(a: Column, dim: int | None = None) -> Column:
    """Ordered L2 norm; same ``dim`` contract as ``dot``."""
    if dim is not None and _FLAT_DIM_ENABLED:
        return F.sqrt(_norm_sq_flat(a, dim))
    return F.sqrt(_norm_sq_fold(a))


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    # try_divide: a zero-norm vector yields NULL cosine (instead of an
    # ANSI-mode DIVIDE_BY_ZERO error) — downstream rankings order NULL
    # last with a deterministic id tiebreak.
    return F.try_divide(
        dot(a, b, dim=dim), l2_norm(a, dim=dim) * l2_norm(b, dim=dim)
    )
