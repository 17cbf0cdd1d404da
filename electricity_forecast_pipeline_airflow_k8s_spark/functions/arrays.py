"""Array math expressions (F8: the reference's NumPy reshape/flatten edge,
re-expressed as ArrayType column math)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col) -> Column:
    """Cast an array<float> column to array<double> (all similarity math
    runs in double so results are engine-portable)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Dot product via zip_with + left-to-right aggregate (deterministic
    summation order -- required for oracle-exact comparisons)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    """NULL (not a DIVIDE_BY_ZERO crash -- session runs ANSI mode) when
    either vector is all-zero; callers' threshold/rank filters drop it."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))
