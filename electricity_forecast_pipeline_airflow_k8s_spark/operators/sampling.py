"""Deterministic sampling and source mixing for training-data pipelines.

The core primitive is hash-threshold sampling: a row is kept iff the
first 8 hex chars of md5(seed \\x1f key) are lexicographically below the
hex encoding of floor(rate * 16^8). Because md5 is uniform and identical
in every engine, this gives

  * exact reproducibility (same seed + key -> same sample, any engine,
    any partitioning, any cluster size -- unlike df.sample, whose output
    depends on the partition layout), and
  * consistent subsets: rate 0.1 is a strict subset of rate 0.2, so a
    pipeline can down-mix a source without reshuffling history.

Mixing applies a per-source rate from a small weights table (broadcast
join -- the weights side is bounded by the number of corpora, never data
volume). This is the standard "data mixture" layout for LLM corpus
assembly: one scan, one broadcast, no shuffle on the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.functions.hashing import stable_hash

_HEX_DIGITS = 8
_HEX_SPACE = 16**_HEX_DIGITS


def hex_threshold(rate: float) -> str:
    """Hex string h such that P[substr(md5, 1, 8) < h] == floor(rate *
    16^8) / 16^8 (within 6e-10 of ``rate``)."""
    v = min(max(int(rate * _HEX_SPACE), 0), _HEX_SPACE)
    return format(v, "08x") if v < _HEX_SPACE else "g" * _HEX_DIGITS

def sample_key(seed: str, *cols) -> Column:
    """The 8-hex-char sampling key for a row."""
    return F.substring(stable_hash(F.lit(seed), *cols), 1, _HEX_DIGITS)


def hash_sample(
    df: DataFrame, *key_cols: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, selected by
    md5(seed, key) threshold. Pure filter -- pushes down, no shuffle."""
    return df.filter(sample_key(seed, *key_cols) < F.lit(hex_threshold(rate)))


def rate_threshold_col(rate_col: Column) -> Column:
    """Column form of :func:`hex_threshold` for per-row (per-source)
    rates: lower(format_string('%08x', floor(rate * 16^8)))."""
    v = F.floor(rate_col * F.lit(float(_HEX_SPACE))).cast("long")
    v = F.least(F.greatest(v, F.lit(0)), F.lit(_HEX_SPACE - 1))
    return F.lower(F.format_string("%08x", v))


def mix_sources(
    df: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    *key_cols: str,
    seed: str = "",
) -> DataFrame:
    """Weighted multi-source sampling: join the tiny ``weights(source,
    rate)`` table (broadcast) and keep each row iff its hash key falls
    under its source's threshold. One scan + one broadcast join; the
    corpus side never shuffles, so this holds at 100 TB regardless of
    how skewed the source distribution is."""
    keyed = df.withColumn("_sk", sample_key(seed, *key_cols))
    joined = keyed.join(F.broadcast(weights), on=source_col, how="inner")
    return (
        joined.filter(F.col("_sk") < rate_threshold_col(F.col("rate")))
        .drop("_sk")
    )


def stratified_topk(
    df: DataFrame,
    stratum_col: str,
    k: int,
    *key_cols: str,
    seed: str = "",
) -> DataFrame:
    """Exact-quota stratified sampling: keep the K rows with the smallest
    hash keys per stratum -- a deterministic, subset-consistent quota
    (adding rows to a stratum can only displace the current selection's
    largest keys, never reshuffle it wholesale).

    The reference's split logic is fraction-based (`core/model.py:170`
    splits by position); quota sampling is the corpus-curation analog:
    "exactly K docs per source", reproducible run-to-run.

    Scale: one shuffle on the stratum key + per-group ORDER BY inside the
    window. K is small and fixed, so the right cluster-scale plan is a
    rank-truncating window -- Spark's WindowGroupLimit pushes the top-K
    truncation into the shuffle's sort (no full per-group materialization
    after Spark 3.5)."""
    w = Window.partitionBy(stratum_col).orderBy(
        sample_key(seed, *key_cols), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample_key(seed: str, weight_col, *cols) -> Column:
    """Efraimidis-Spirakis (A-ES) weighted-sampling key: keep the K rows
    with the SMALLEST -ln(u)/w (u uniform from the row's md5) for an
    exact weighted-without-replacement sample.

    Deterministic and engine-portable like :func:`sample_key`: u derives
    from the same md5 construction ((int(hex8) + 0.5) / 16^8, never 0 or
    1), so the same seed reproduces the same sample on any engine, any
    partitioning. Selection is a rank-truncating window (WindowGroupLimit:
    per-task top-K before the exchange), never a global sort."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        F.conv(sample_key(seed, *cols), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(float(_HEX_SPACE))
    return -F.log(u) / w
