"""Key-salting for skewed aggregations/joins (SURVEY §7.3 risk 5: few
group keys x many rows per key is exactly the electricity-series shape).

AQE's skew-join splitting (on by default in session.py) handles joins;
salting is for skewed *aggregations*: two-level agg via a salt column --
partial agg on (key, salt), final agg on key. Use for algebraic aggregates
(sum/count/min/max); not valid for holistic ones (exact percentile)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_keys(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic-per-row salt in [0, n_salts) (hash of all
    columns, not rand(), so retries/replays stay consistent)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def unsalt(df: DataFrame, salt_col: str = "_salt") -> DataFrame:
    return df.drop(salt_col)


def salted_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 16
) -> DataFrame:
    """Example two-level pattern: count per key without a single hot
    reducer. partial: (key, salt) -> count; final: key -> sum.

    The salt must vary WITHIN a key, so it hashes ALL columns of the input
    (hashing only the keys would give every row of a hot key the same salt
    -- the same hot reducer with extra steps). Rows that are full
    duplicates still share a salt; use monotonically_increasing_id for
    fully-duplicated hot rows if that matters."""
    salted = salt_keys(df, n_salts).select(*key_cols, "_salt")
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("n"))


def salted_stats(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-level salted aggregation for a full algebraic stat bundle:
    partial (key, salt) -> (count, decimal-sum, min, max); final key ->
    merge. Every partial is mergeable, so the hot key's rows fan out over
    ``n_salts`` reducers and the final agg touches n_keys x n_salts rows.
    DECIMAL for the sum keeps the two-level result bit-identical to a
    single-level aggregation (double addition would re-associate)."""
    v = F.col(value_col)
    salted = salt_keys(df, n_salts).select(*key_cols, "_salt", value_col)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v.cast("decimal(18,2)")).alias("_s"),
        F.count(value_col).alias("_nv"),
        F.min(v).alias("_mn"),
        F.max(v).alias("_mx"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").alias("n"),
        (F.sum("_s").cast("double") / F.sum("_nv")).alias("mean_value"),
        F.min("_mn").alias("min_value"),
        F.max("_mx").alias("max_value"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    n_salts: int = 8,
    salt_col: str = "_salt",
) -> DataFrame:
    """Manual skew-join mitigation: replicate the SMALL side across
    ``n_salts`` salt values (explode on a literal range) and join on
    (key, salt), so a hot key's fact rows spread over n_salts reducers
    instead of one. The replicated dim costs n_salts x |dim| rows --
    affordable exactly when the dim is broadcast-sized but the engine
    chose a shuffle join (e.g. the dim exceeds the broadcast threshold
    while the fact is wildly skewed). AQE's runtime skew splitting
    (session.py default) usually makes this unnecessary; this operator is
    the explicit fallback for engines/paths where it doesn't engage
    (cartesian-range salt replication is plan-stable, AQE is adaptive)."""
    fact_s = fact.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)),
    )
    dim_s = dim.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, [*key_cols, salt_col]).drop(salt_col)
