"""Declarative validation suite -- the reference validator re-expressed as
Spark aggregation plans.

Reference: `ElectricityDataValidator.validate` (`core/data_validation.py:74-235`)
runs a Pandera schema (coerce, lazy) plus hand-written quality checks, each as
its own pandas pass with per-region Python loops. Here every check family is
compiled into native Column aggregations (zero UDFs -- SURVEY §2.10 U1), so
one Spark job computes all global checks in a single hash-agg pass and the
per-group checks in one grouped pass each, at any scale.

Semantics mirrored exactly (thresholds from `core/data_validation.py` and
`config.yaml`):
  * null period/respondent           -> error    (:30-46)
  * type outside {D,NG,TI,ID}        -> error    (:47-53)
  * value < 0                        -> error    (:54-58)
  * value >= 3 * q99(value)          -> error    (:61-62, two-pass dynamic gate)
  * value null rate > 5%             -> error; any nulls -> warning (:139-147)
  * duplicate (respondent, period)   -> error    (:149-154)
  * gaps > 1.5x expected cadence     -> warning  (:110-133)
  * per-group IQRx3 outliers > 2%    -> warning  (:187-218)

Outputs: a flat ``checks`` DataFrame (check, level, scope, metric, threshold,
passed, message) -- the SQL-testable surface -- plus a nested report dict
shaped like the reference's JSON report (`core/data_validation.py:81-86`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.profile import (
    DEFAULT_GAP_TOLERANCE_SECONDS,
)

VALID_TYPES = ("D", "NG", "TI", "ID")
MISSING_PCT_ERROR = 5.0  # core/data_validation.py:140-143
OUTLIER_PCT_WARN = 2.0  # core/data_validation.py:199-200,205
EXTREME_Q99_FACTOR = 3.0  # core/data_validation.py:61-62
IQR_K = 3.0  # core/data_validation.py:195-197


@dataclass
class ValidationReport:
    is_valid: bool
    errors: list[str]
    warnings: list[str]
    stats: dict[str, Any]
    checks: DataFrame = field(repr=False, default=None)

    def as_dict(self) -> dict[str, Any]:
        return {
            "is_valid": self.is_valid,
            "errors": self.errors,
            "warnings": self.warnings,
            "stats": self.stats,
        }


def _global_checks(
    df: DataFrame, group_col: str, ts_col: str, value_col: str, type_col: str | None
) -> dict[str, Any]:
    """All global checks in ONE aggregation pass (plus the q99 two-pass gate).

    The q99*3 extreme gate needs a threshold computed from the same column
    (`core/data_validation.py:61-62`); at scale this is a scalar subquery:
    tiny aggregate -> broadcast -> second pass. We fold the second pass into
    the same job via a crossJoin of the 1-row threshold.
    """
    v, t, g = F.col(value_col), F.col(ts_col), F.col(group_col)
    aggs = [
        F.count(F.lit(1)).alias("total_records"),
        F.sum(F.when(t.isNull(), 1).otherwise(0)).alias("null_period"),
        F.sum(F.when(g.isNull(), 1).otherwise(0)).alias("null_respondent"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("missing_values"),
        F.sum(F.when(v < 0, 1).otherwise(0)).alias("negative_values"),
        F.count_distinct(g).alias("unique_regions"),
        F.sort_array(F.collect_set(g)).alias("regions"),
        F.min(t).alias("date_min"),
        F.max(t).alias("date_max"),
        F.avg(v).alias("value_mean"),
        F.stddev_samp(v).alias("value_std"),
        F.min(v).alias("value_min"),
        F.max(v).alias("value_max"),
        F.percentile(v, F.lit(0.5)).alias("value_median"),
        F.percentile(v, F.lit(0.99)).alias("value_q99"),
        # struct-wrapped so rows with a NULL key/ts still count as distinct
        # tuples (bare count_distinct(g, t) drops them -> phantom dups)
        (F.count(F.lit(1)) - F.count_distinct(F.struct(g, t))).alias(
            "duplicate_timestamps"
        ),
    ]
    if type_col and type_col in df.columns:
        aggs.append(
            F.sum(
                F.when(
                    F.col(type_col).isNotNull() & ~F.col(type_col).isin(*VALID_TYPES), 1
                ).otherwise(0)
            ).alias("bad_type")
        )
    row = df.agg(*aggs).collect()[0].asDict()
    if "bad_type" not in row:
        row["bad_type"] = 0

    # second pass: extreme gate against 3*q99 (dynamic threshold)
    thr = row["value_q99"]
    if thr is not None:
        row["extreme_values"] = df.filter(v >= EXTREME_Q99_FACTOR * F.lit(thr)).count()
    else:
        row["extreme_values"] = 0
    return row


def _gap_stats(
    df: DataFrame, group_col: str, ts_col: str, tolerance_s: int
) -> list[dict[str, Any]]:
    """Per-group gap detection via one window pass (W1); replaces the
    reference's per-region loop (`core/data_validation.py:110-133`)."""
    w = Window.partitionBy(group_col).orderBy(ts_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    out = (
        df.select(F.col(group_col), gap_us.alias("gap_us"))
        .groupBy(group_col)
        .agg(
            F.sum(F.when(F.col("gap_us") > tolerance_s * 1_000_000, 1).otherwise(0)).alias(
                "n_gaps"
            ),
            (F.max("gap_us") / 1_000_000.0).alias("max_gap_s"),
        )
        .orderBy(group_col)
    )
    return [r.asDict() for r in out.collect()]


def _outlier_stats(
    df: DataFrame, group_col: str, value_col: str, iqr_k: float
) -> list[dict[str, Any]]:
    """Per-group IQR-bound outliers in ONE scan: exact quantiles as a
    whole-partition window aggregate, so each row carries its group's
    bounds and the outlier flag aggregates inline (A10/A11; same plan
    shape as operators/profile.quality_profile)."""
    v = F.col(value_col)
    wp = Window.partitionBy(group_col)
    qs = F.percentile(v, F.array(F.lit(0.25), F.lit(0.75))).over(wp)
    enriched = df.select(F.col(group_col), v.alias(value_col), qs.alias("_qs"))
    q1, q3 = F.element_at("_qs", 1), F.element_at("_qs", 2)
    lower = q1 - iqr_k * (q3 - q1)
    upper = q3 + iqr_k * (q3 - q1)
    out = (
        enriched.groupBy(group_col)
        .agg(
            F.sum(F.when((v < lower) | (v > upper), 1).otherwise(0)).alias(
                "n_outliers"
            ),
            F.count(F.lit(1)).alias("n_rows"),
            F.first(lower).alias("lower"),
            F.first(upper).alias("upper"),
        )
        .orderBy(group_col)
    )
    return [r.asDict() for r in out.collect()]


def _per_group_stats(
    df: DataFrame, group_col: str, value_col: str
) -> list[dict[str, Any]]:
    """A9: one hash-agg replaces N filtered pandas passes
    (`core/data_validation.py:176-185`)."""
    v = F.col(value_col)
    out = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.avg(v).alias("mean"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
        )
        .orderBy(group_col)
    )
    return [r.asDict() for r in out.collect()]


def validate(
    df: DataFrame,
    group_col: str = "respondent",
    ts_col: str = "period",
    value_col: str = "value",
    type_col: str | None = "type",
    gap_tolerance_seconds: int = DEFAULT_GAP_TOLERANCE_SECONDS,
) -> ValidationReport:
    """Run the full suite; returns the reference-shaped report plus the flat
    checks DataFrame. Heavy input is scanned a bounded number of times
    (global agg, extreme gate, gaps window, outlier two-pass) regardless of
    group count -- no per-group driver loops."""
    spark = df.sparkSession
    g = _global_checks(df, group_col, ts_col, value_col, type_col)
    gaps = _gap_stats(df, group_col, ts_col, gap_tolerance_seconds)
    outliers = _outlier_stats(df, group_col, value_col, IQR_K)
    per_group = _per_group_stats(df, group_col, value_col)

    errors: list[str] = []
    warnings: list[str] = []
    n = g["total_records"] or 0

    if n == 0:
        errors.append("dataset is empty")
    if g["null_period"]:
        errors.append(f"null {ts_col}: {g['null_period']} rows")
    if g["null_respondent"]:
        errors.append(f"null {group_col}: {g['null_respondent']} rows")
    if g["bad_type"]:
        errors.append(f"{type_col} outside {set(VALID_TYPES)}: {g['bad_type']} rows")
    if g["negative_values"]:
        errors.append(f"negative {value_col}: {g['negative_values']} rows")
    if g["extreme_values"]:
        errors.append(
            f"extreme {value_col} >= {EXTREME_Q99_FACTOR}*q99: {g['extreme_values']} rows"
        )
    missing_pct = (g["missing_values"] * 100.0 / n) if n else 0.0
    if missing_pct > MISSING_PCT_ERROR:
        errors.append(
            f"missing {value_col}: {g['missing_values']} ({missing_pct:.2f}% > "
            f"{MISSING_PCT_ERROR}%)"
        )
    elif g["missing_values"]:
        warnings.append(f"missing {value_col}: {g['missing_values']} ({missing_pct:.2f}%)")
    if g["duplicate_timestamps"]:
        errors.append(
            f"duplicate ({group_col},{ts_col}): {g['duplicate_timestamps']} rows"
        )
    for row in gaps:
        if row["n_gaps"]:
            warnings.append(
                f"{row[group_col]}: {row['n_gaps']} gaps > {gap_tolerance_seconds}s "
                f"(max {row['max_gap_s']:.0f}s)"
            )
    total_outliers = sum(r["n_outliers"] for r in outliers)
    for row in outliers:
        pct = row["n_outliers"] * 100.0 / row["n_rows"] if row["n_rows"] else 0.0
        if pct > OUTLIER_PCT_WARN:
            warnings.append(
                f"{row[group_col]}: {row['n_outliers']} outliers ({pct:.2f}% > "
                f"{OUTLIER_PCT_WARN}%)"
            )

    stats = {
        "total_records": n,
        "missing_values": g["missing_values"],
        "unique_regions": g["unique_regions"],
        "regions": list(g["regions"] or []),
        "date_range": {
            "start": g["date_min"].isoformat() if g["date_min"] else None,
            "end": g["date_max"].isoformat() if g["date_max"] else None,
        },
        "value_stats": {
            "mean": g["value_mean"],
            "std": g["value_std"],
            "min": g["value_min"],
            "max": g["value_max"],
            "median": g["value_median"],
        },
        "per_region": {
            r[group_col]: {k: r[k] for k in ("records", "mean", "min", "max")}
            for r in per_group
        },
        "outliers": {
            "total_count": total_outliers,
            "overall_percentage": (total_outliers * 100.0 / n) if n else 0.0,
            "per_region": {
                r[group_col]: {
                    "count": r["n_outliers"],
                    "percentage": r["n_outliers"] * 100.0 / r["n_rows"] if r["n_rows"] else 0.0,
                    "bounds": {"lower": r["lower"], "upper": r["upper"]},
                }
                for r in outliers
            },
        },
    }

    check_rows = [
        ("null_period", "error", "__all__", float(g["null_period"]), 0.0),
        ("null_respondent", "error", "__all__", float(g["null_respondent"]), 0.0),
        ("bad_type", "error", "__all__", float(g["bad_type"]), 0.0),
        ("negative_values", "error", "__all__", float(g["negative_values"]), 0.0),
        ("extreme_values", "error", "__all__", float(g["extreme_values"]), 0.0),
        ("missing_pct", "error", "__all__", missing_pct, MISSING_PCT_ERROR),
        ("duplicate_timestamps", "error", "__all__", float(g["duplicate_timestamps"]), 0.0),
    ]
    for row in gaps:
        check_rows.append(("gaps", "warning", row[group_col], float(row["n_gaps"]), 0.0))
    for row in outliers:
        pct = row["n_outliers"] * 100.0 / row["n_rows"] if row["n_rows"] else 0.0
        check_rows.append(("outlier_pct", "warning", row[group_col], pct, OUTLIER_PCT_WARN))
    checks = spark.createDataFrame(
        [
            (c, lvl, scope, metric, thr, metric <= thr)
            for c, lvl, scope, metric, thr in check_rows
        ],
        "check string, level string, scope string, metric double, threshold double, passed boolean",
    )

    return ValidationReport(
        is_valid=not errors, errors=errors, warnings=warnings, stats=stats, checks=checks
    )
