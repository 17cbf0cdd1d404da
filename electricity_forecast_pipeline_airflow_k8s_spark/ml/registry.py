"""Model registry on the lake: versioned params-as-data.

The reference registers each trained model in an MLflow Model Registry
backed by MinIO (`core/kubeflow_pipeline.py:330-368`: log_model ->
register_model -> version number -> metric description) and resolves
"latest" at serving time. Spark-first, a model IS a DataFrame (the
params-as-data convention of ml/forecast.py), so the registry is two
parquet surfaces under ``<root>/registry/``:

* ``<root>/registry/<name>/v=<version>/`` -- the immutable per-version
  params snapshot (one row per group: weights, lookback, horizon);
* ``<root>/registry/_catalog/`` -- an append-only catalog of
  (model_name, version, created_ts, metrics_json, path) rows. Appends
  are atomic at the parquet-file level, versions are monotonically
  increasing per name, and "latest" is an argmax over the catalog.

No external service, no pickle: everything is columnar, scan-parallel,
and readable by any engine. Retention composes with
sources/snapshots.apply_retention semantics (keep-newest-K versions).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATALOG_SCHEMA = (
    "model_name string, version long, created_ts timestamp, "
    "metrics_json string, path string"
)


def _catalog_path(root: str) -> str:
    return f"{root.rstrip('/')}/registry/_catalog"


def _version_path(root: str, name: str, version: int) -> str:
    return f"{root.rstrip('/')}/registry/{name}/v={version}"


def _read_catalog(spark: SparkSession, root: str) -> DataFrame:
    try:
        return spark.read.schema(CATALOG_SCHEMA).parquet(_catalog_path(root))
    except Exception:  # first registration: no catalog yet
        return spark.createDataFrame([], CATALOG_SCHEMA)


def register_model(
    spark: SparkSession,
    params: DataFrame,
    root: str,
    name: str,
    metrics: dict | None = None,
) -> int:
    """Persist ``params`` as the next version of ``name`` and append the
    catalog row; returns the new version number (1-based, monotone).

    Mirrors `core/kubeflow_pipeline.py:341-356` (register + versioned
    description carrying the eval metrics)."""
    cat = _read_catalog(spark, root)
    prev = (
        cat.filter(F.col("model_name") == name)
        .agg(F.max("version").alias("v"))
        .collect()[0]["v"]
    )
    version = int(prev or 0) + 1
    path = _version_path(root, name, version)
    params.write.mode("errorifexists").parquet(path)
    row = [(name, version, None, json.dumps(metrics or {}, sort_keys=True), path)]
    entry = spark.createDataFrame(row, CATALOG_SCHEMA).withColumn(
        "created_ts", F.current_timestamp()
    )
    entry.write.mode("append").parquet(_catalog_path(root))
    return version


def latest_version(spark: SparkSession, root: str, name: str) -> int | None:
    v = (
        _read_catalog(spark, root)
        .filter(F.col("model_name") == name)
        .agg(F.max("version").alias("v"))
        .collect()[0]["v"]
    )
    return int(v) if v is not None else None


def load_model(
    spark: SparkSession, root: str, name: str, version: int | None = None
) -> DataFrame:
    """Params DataFrame for (name, version); latest when version is None
    (the serving-time "load current model" resolution the reference does
    through the MLflow client)."""
    if version is None:
        version = latest_version(spark, root, name)
        if version is None:
            raise FileNotFoundError(f"no registered versions of {name!r}")
    return spark.read.parquet(_version_path(root, name, version))


def describe(spark: SparkSession, root: str, name: str | None = None) -> DataFrame:
    """Catalog view: one row per (model, version) with parsed metric
    columns, newest first."""
    cat = _read_catalog(spark, root)
    if name is not None:
        cat = cat.filter(F.col("model_name") == name)
    return cat.orderBy(F.desc("created_ts"), F.desc("version"))


def apply_version_retention(
    spark: SparkSession, root: str, name: str, keep: int = 3
) -> list[int]:
    """Drop all but the newest ``keep`` versions of ``name`` (storage
    hygiene for per-group params that can be wide at many groups).
    Returns the deleted version numbers. Catalog rows for deleted
    versions are retained as history (MLflow keeps registry metadata for
    archived versions too)."""
    versions = sorted(
        r["version"]
        for r in _read_catalog(spark, root)
        .filter(F.col("model_name") == name)
        .select("version")
        .distinct()
        .collect()
    )
    doomed = versions[:-keep] if keep > 0 else versions
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hconf = jsc.hadoopConfiguration()
    for v in doomed:
        p = jvm.org.apache.hadoop.fs.Path(_version_path(root, name, v))
        fs = p.getFileSystem(hconf)
        fs.delete(p, True)
    return [int(v) for v in doomed]
