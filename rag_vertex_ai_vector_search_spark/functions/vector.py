"""Vector math as native Spark SQL expressions.

The reference's index is DOT_PRODUCT_DISTANCE over unit-normalized
embeddings (common/config.py:33, README.md:68), so dot product == cosine.

Everything here is a Column expression (JVM-side, whole-stage codegen) --
no Python in the hot path. The fold accumulates left-to-right in DOUBLE,
which is bit-identical to DuckDB's ``list_dot_product`` on DOUBLE[] --
that exactness is what lets the driver hash-match vector queries against
the oracle. For large dims x rows the GEMM pandas-UDF path in
``operators/knn.py`` is faster (one BLAS call per Arrow batch), but its
blocked summation is not bit-identical; use it where scores feed a
threshold or ranking, not a hash comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.sqrt(
        F.aggregate(
            v,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(v: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged."""
    v = F.col(v) if isinstance(v, str) else v
    norm = l2_norm(v)
    return F.when(norm == 0.0, v.cast("array<double>")).otherwise(
        F.transform(v, lambda x: x.cast("double") / norm)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)


def squared_l2(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance via three sequential folds
    (dd(a,a) + dd(b,b) - 2*dd(a,b)) -- each fold == DuckDB
    list_dot_product, so the whole expression mirrors bit-exactly."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return (
        dot_product(a, a) + dot_product(b, b)
        - F.lit(2.0) * dot_product(a, b)
    )


def constant_partition_key(col: Column | str) -> Column:
    """Constant-zero, NON-FOLDABLE window partition key.

    ``Window.partitionBy(F.lit(0))`` does not survive Catalyst: foldable
    partition expressions are optimized away, leaving an empty partition
    spec and WindowExec's "No Partition Defined" warning at runtime.
    Keying on ``pmod(xxhash64(col), 1)`` keeps the expression in the
    physical plan (it references a column, so it cannot fold) while
    still mapping every row to the single partition. Use ONLY where the
    windowed input is already reduced (post-limit / post-aggregate) so
    one partition is the intended plan, not an accident.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(1))
