"""Exact heavy hitters with bounded memory: Misra-Gries candidates +
one exact counting pass.

The word-count shuffle (explode -> groupBy token) is exact but moves one
record per DISTINCT key -- at 100 TB of text the token vocabulary is
billions of keys and the shuffle is vocabulary-sized even though only a
handful of tokens can exceed any frequency threshold. The classic fix is
two passes:

  1. per-partition Misra-Gries summaries with k counters (mapInPandas,
     batch-merged: a batch's exact value_counts is itself an error-free
     summary, and merging two MG(k) summaries -- sum counters, subtract
     the (k+1)-th largest, drop non-positive -- preserves the MG error
     bound of n/(k+1); Agarwal et al., "Mergeable Summaries", PODS'12).
     Output is <= k candidate rows per partition plus one token-count
     row, NEVER data-sized.
  2. pigeonhole union guarantee: if a token's GLOBAL count exceeds
     n/(k+1), some partition has local count > n_p/(k+1) (otherwise the
     sum contradicts), so the token survives that partition's summary.
     The union of candidates is therefore a SUPERSET of every token over
     threshold -- no false negatives, ever.
  3. exact pass: broadcast-semi-join the token stream against the
     candidate set (bounded by partitions x k) and count exactly; the
     integer predicate count * (k+1) > n keeps the threshold float-free.

Cost: two scans, zero vocabulary-sized shuffles -- the only grouped
aggregation runs over candidate-matched rows. The exact same result as
the full word count filtered to the threshold, proven by the DuckDB
oracle on `text_heavy_hitters`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict[str, int], batch: dict[str, int], k: int) -> dict[str, int]:
    """Merge exact batch counts into an MG(k) summary, keeping <= k keys."""
    for t, c in batch.items():
        counters[t] = counters.get(t, 0) + int(c)
    if len(counters) > k:
        # subtract the (k+1)-th largest count from everything, drop <= 0
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {t: c - cut for t, c in counters.items() if c - cut > 0}
    return counters


def mg_candidates(
    token_df: DataFrame, token_col: str, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries: <= k (token, lower-bound)
    rows per partition plus one (NULL, partition token count) row. Null
    tokens in the input are ignored."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            col = pdf[token_col].dropna()
            n += len(col)
            counters = _mg_merge(counters, col.value_counts().to_dict(), k)
        yield pd.DataFrame(
            {
                "token": list(counters) + [None],
                "lower_bound": pd.array(
                    list(counters.values()) + [n], dtype="int64"
                ),
            }
        )

    return token_df.select(F.col(token_col).alias(token_col)).mapInPandas(
        summarize, schema="token string, lower_bound long"
    )


def heavy_hitters_exact(
    token_df: DataFrame, token_col: str, k: int
) -> DataFrame:
    """All tokens with count * (k+1) > n (i.e. frequency share strictly
    above 1/(k+1)) with their EXACT counts: MG candidate pass + exact
    counting pass over candidate-matched rows only. Returns
    (token, freq)."""
    summaries = mg_candidates(token_df, token_col, k).collect()
    n = sum(r["lower_bound"] for r in summaries if r["token"] is None)
    candidates = sorted({r["token"] for r in summaries if r["token"] is not None})
    spark = token_df.sparkSession
    if not candidates or n == 0:
        return spark.createDataFrame([], f"{token_col} string, freq long")
    cand_df = spark.createDataFrame(
        [(c,) for c in candidates], f"{token_col} string"
    )
    return (
        token_df.join(F.broadcast(cand_df), token_col, "semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * (k + 1) > F.lit(n))
    )
