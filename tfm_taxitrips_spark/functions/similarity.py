"""Vector-similarity primitives (SURVEY.md §2.10: similarity search).

Dot products are sequential left-folds over array<double>
(``F.aggregate(zip_with(...))``) — verified bit-identical to DuckDB's
``list_dot_product`` on the same doubles, so cosine scores hash-match the
oracle exactly (no rounding needed).

LSH hyperplanes are *derived arithmetically* from (plane, dim) indices —
no stored model, both engines recompute the identical planes. Bucketing
reduces ANN from all-pairs O(n²) to per-bucket joins: the scale path for
100 TB embedding stores (brute force stays as the exact baseline / rerank
step within a bucket).
"""

from __future__ import annotations

# module-level so the pandas-UDF type hints below resolve: PEP 563 turns
# annotations into strings evaluated against MODULE globals, so a
# function-local ``import pandas`` would leave 'pd.Series' unresolvable
# (house precedent: streaming/stateful.py, functions/multimodal.py)
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: LCG-style plane coefficients (shared with the SQL oracle)
_PLANE_MUL = 1103515245
_PLANE_ADD = 12345
_PLANE_MOD = 2001

LSH_PLANES = 8
EMBEDDING_DIM = 64


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic, order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _plane_values(j: int, dim: int = EMBEDDING_DIM) -> list[float]:
    """The plane-j coefficients, computed once on the driver. Bit-identical
    to the former per-row expression: the LCG products stay far below 2^63
    (max ≈ 5.7e11 at j*dim+d ≤ 512·dim), the modulus yields an integer in
    [0, 2000], and int→double, /1000.0, -1.0 are each exact IEEE-754
    operations with one deterministic rounding — Python and the JVM agree
    on every value."""
    return [
        float((_PLANE_MUL * (j * dim + d) + _PLANE_ADD) % _PLANE_MOD) / 1000.0 - 1.0
        for d in range(dim)
    ]


#: built-plane memo: the literal Column for (j, dim) is immutable plan
#: fragment — built once per process, reused by every query construction.
#: Building it costs ``dim`` ``F.lit`` py4j round-trips (~64 per plane,
#: 512 per bucket expression), which showed up as ~0.2 s of pure driver
#: build time per ANN query (guide §1 'measure first'; profile_memo1).
#: Safe across sessions: local-mode JVM and its py4j gateway outlive
#: ``SparkSession.stop()``, and a literal expression holds no session
#: state.
_PLANE_MEMO: dict[tuple[int, int], Column] = {}


def _plane(j: int, dim: int = EMBEDDING_DIM) -> Column:
    """Pseudo-random hyperplane j as array<double> in [-1, 1], derived from
    integer arithmetic only (LCG over plane*dim+d; BIGINT math on both
    engines — Spark int*int would silently wrap).

    r18 optimization (guide §1.2 'per-task work'): emitted as a LITERAL
    array. The previous ``transform(sequence(0, dim-1), …)`` form is a
    higher-order function Catalyst does not constant-fold, so every row
    re-derived all ``n_planes × dim`` coefficients before the dot product
    — pure waste replicated per row per plane. Values are identical (see
    :func:`_plane_values`); the SQL oracle keeps the expression form."""
    key = (j, dim)
    col = _PLANE_MEMO.get(key)
    if col is None:
        col = F.array(*[F.lit(v) for v in _plane_values(j, dim)])
        _PLANE_MEMO[key] = col
    return col


def plane_sql(j: int, dim: int = EMBEDDING_DIM) -> str:
    return (
        f"list_transform(range(0, {dim}), d -> "
        f"CAST(({_PLANE_MUL}::BIGINT * ({j * dim}::BIGINT + d) + {_PLANE_ADD}) % {_PLANE_MOD} AS DOUBLE)"
        f" / 1000.0 - 1.0)"
    )


def lsh_bucket(vec: Column, n_planes: int = LSH_PLANES, dim: int = EMBEDDING_DIM) -> Column:
    """Sign-of-projection LSH: bucket id packs one bit per hyperplane."""
    e = as_double(vec) if not isinstance(vec, Column) else vec
    bucket = F.lit(0)
    for j in range(n_planes):
        bit = F.when(dot(e, _plane(j, dim)) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def lsh_bucket_sql(vec_expr: str, n_planes: int = LSH_PLANES, dim: int = EMBEDDING_DIM) -> str:
    bits = " + ".join(
        f"CASE WHEN list_dot_product({vec_expr}, {plane_sql(j, dim)}) > 0 THEN {1 << j} ELSE 0 END"
        for j in range(n_planes)
    )
    return f"CAST({bits} AS INT)"


def cosine_pandas_udf():
    """Arrow-vectorized cosine as a ``@pandas_udf`` — the *alternate* path.

    Kept for API completeness and as the measured comparison point for the
    engine rule "built-ins beat UDFs" (SCALE.md 'Python boundary'): the
    fold-based :func:`cosine` runs inside whole-stage codegen with zero
    Python round-trip; this one ships both arrays to a Python worker per
    batch. numpy sums in a different association order than the sequential
    fold, so results agree only to ~1e-12 relative — which is exactly why
    the oracle-checked queries use the fold, not this.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # Type-hint form (SPARK-28264) — the PandasUDFType.SCALAR constant
    # this replaced is deprecated for removal.
    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            return float(xv @ yv / (np.linalg.norm(xv) * np.linalg.norm(yv)))

        return pd.Series([one(x, y) for x, y in zip(a, b)])

    return _cos
