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


def let(col, body):
    """Single-evaluation binding for higher-order-function bodies:
    ``let(expensive_expr, lambda x: ...x...x...)`` evaluates the
    expression ONCE and exposes it to the body as a bound lambda
    variable. HOF lambdas are interpreted with no common-subexpression
    elimination, so any non-trivial expression referenced inside a
    lambda body is re-evaluated per array element -- e.g. the winnowing
    fingerprint array-comprehension re-hashed every gram per window
    (O(grams x window) md5, see operators/text.py winnow_posts).
    Wrapping costs one single-element array + element_at."""
    from pyspark.sql import functions as F

    return F.element_at(F.transform(F.array(col), body), 1)
