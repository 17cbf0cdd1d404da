"""SparkSession construction with scale-oriented defaults.

The reference pipeline runs single-threaded pandas in one worker pod
(`core/airflow_dag.py`, `core/kubeflow_pipeline.py`); here every job is a
distributed Spark plan, so the session carries the configs that matter at
cluster scale: AQE (runtime coalescing + skew-join splitting), Arrow for
every pandas-UDF boundary, and sane shuffle-partition defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB design point but overridable per-job:
#  - AQE on: runtime partition coalescing + skew-join handling (few group
#    keys x many rows per key is exactly the reference's data shape).
#  - 128 MiB target partition bytes keeps scan partitions memory-friendly.
#  - Arrow on: every pandas-UDF boundary is vectorized.
_BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}


def default_parallelism() -> int:
    """Worker-thread count for local mode (driver contract: SPARK_GRAFT_CPUS)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "electricity-forecast-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]`` with shuffle partitions matched to cores
    (at cluster scale, shuffle partitions should be sized so each partition
    stays ~100-200 MiB; AQE coalescing then trims the tail).
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or max(cpus, 8))
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def s3a_conf(
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
) -> dict[str, str]:
    """Hadoop-S3A configs for an S3-compatible object store.

    The reference stores CSV snapshots in MinIO via the `minio` client
    (`core/data_extraction.py:140-172`, `core/airflow_dag.py:202-214`); the
    Spark-native equivalent is s3a:// URIs with these configs, letting every
    executor read/write its own split instead of funneling bytes through one
    process.
    """
    return {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": "false",
        # committer + upload tuning: the magic committer commits via
        # multipart-upload completion instead of rename (S3 has no rename;
        # the default FileOutputCommitter v1 does O(files) copies at job
        # commit -- a 100 TB write would spend hours there). These are
        # Hadoop-side keys consulted only for s3a:// paths, so carrying
        # them in every session is safe for file://.
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.hadoop.fs.s3a.connection.maximum": "64",
        "spark.hadoop.fs.s3a.multipart.size": "67108864",
        "spark.hadoop.fs.s3a.fast.upload": "true",
    }


def s3a_committer_conf() -> dict[str, str]:
    """Spark-side bindings that route parquet writes through the S3A
    PathOutputCommitter (magic committer). Split from :func:`s3a_conf`
    because these two keys change the commit protocol for ALL writes and
    require the ``spark-hadoop-cloud`` module on the classpath -- apply
    them only on clusters that ship it (any s3-targeting distro does)."""
    return {
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
    }
