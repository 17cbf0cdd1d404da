"""Slowly-changing-dimension (SCD type 2) maintenance: build and update
versioned dimension tables from change logs.

The reference pipeline re-extracts full snapshots and keeps the newest K
files (`core/airflow_dag.py:595-615` retention); an engine serving a
warehouse needs the finer-grained form -- per-key version intervals with
validity ranges. Declarative layout: ONE window per key over the change
log, consecutive-duplicate suppression, then lead() for the closing
timestamp. No merges, no per-row Python.

Scale: everything is a single hash shuffle on the dimension key plus an
ordered window within each key -- the same shape as sessionization. A
dimension key's full history lands in one task, which is the correct
trade for dimensions (bounded history per key); for fact-sized change
logs use the (key, time-bucket) layout from quality_profile_scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change log (key, attrs, ts) into SCD2 version rows:
    one row per (key, distinct consecutive attr state) carrying
    ``valid_from`` / ``valid_to`` (null = open) / ``is_current``.

    Consecutive rows with identical attributes are suppressed (they renew
    the version, not create one); the comparison is null-safe, so a NULL
    attribute equals itself.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col).asc_nulls_last()] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~state.eqNullSafe(F.lag(state).over(w)) | F.lag(state).over(w).isNull()
    versions = changes.withColumn("_chg", changed).filter(F.col("_chg"))
    wv = Window.partitionBy(*keys).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(wv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def scd2_point_in_time(
    dim: DataFrame,
    at,
    ts_from: str = "valid_from",
    ts_to: str = "valid_to",
) -> DataFrame:
    """The as-of read over an SCD2 dimension: rows whose validity interval
    covers ``at`` (valid_from <= at < valid_to, open intervals included).
    A pure filter -- pushes down to the scan; combined with a dimension
    partitioned by date(valid_from) it prunes partitions too."""
    at_col = F.lit(at).cast("timestamp")
    return dim.filter(
        (F.col(ts_from) <= at_col)
        & (F.col(ts_to).isNull() | (F.col(ts_to) > at_col))
    )
