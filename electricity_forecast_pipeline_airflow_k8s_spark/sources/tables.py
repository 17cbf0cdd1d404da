"""Parquet table loaders for the driver testdata layout (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings -- one parquet per table under an sf directory.

Columnar Parquet replaces the reference's CSV snapshots
(`core/airflow_dag.py:203` writes CSV; every downstream stage re-parses
timestamps, e.g. `core/kubeflow_pipeline.py:94`): with Parquet the schema is
typed once, scans are vectorized, and Catalyst pushes filters/projections
into the row groups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _parquet_ts_is_nanos(path: str, col: str = "ts") -> bool:
    """True iff the parquet footer declares ``col`` as TIMESTAMP(NANOS)
    (pyarrow timestamp('ns')). Driver-side metadata read only -- one
    footer, no data.

    A bigint ``ts`` under ``nanosAsLong`` is ambiguous: TIMESTAMP(NANOS)
    must be divided to micros, a genuine int64 must not. Guessing either
    way silently corrupts one of the two, so footer-read failures are an
    error, not a fallback. Environments where the footer is unreachable
    from the driver (e.g. a filesystem Spark can read but pyarrow cannot)
    can force the unit with SPARK_GRAFT_BIGINT_TS=ns|raw.
    """
    forced = os.environ.get("SPARK_GRAFT_BIGINT_TS")
    if forced in ("ns", "raw"):
        return forced == "ns"
    try:
        import pyarrow.dataset as ds
    except ImportError:
        import warnings

        warnings.warn(
            f"pyarrow unavailable; assuming bigint {col!r} in {path!r} is "
            "TIMESTAMP(NANOS) (legacy behavior). Set SPARK_GRAFT_BIGINT_TS "
            "to 'ns' or 'raw' to silence this.",
            stacklevel=2,
        )
        return True
    import pyarrow as pa

    try:
        schema = ds.dataset(path, format="parquet").schema
        field = schema.field(col)
    except (KeyError, OSError, pa.ArrowInvalid, pa.ArrowIOError) as exc:
        raise ValueError(
            f"cannot read the parquet footer of {path!r} to decide whether "
            f"bigint {col!r} is TIMESTAMP(NANOS) or a genuine int64: {exc}. "
            "Refusing to guess (either wrong guess silently corrupts the "
            "column). Set SPARK_GRAFT_BIGINT_TS=ns or =raw to declare the "
            "unit explicitly."
        ) from exc
    return str(field.type) in ("timestamp[ns]", "timestamp[ns, tz=UTC]")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one testdata table. Plain parquet scan -- predicate pushdown,
    column pruning, and split-based parallelism all come from Catalyst.

    `events.ts` arrives in whatever precision/annotation the fixture writer
    chose, and every downstream consumer assumes a session-TZ TIMESTAMP:

    - TIMESTAMP(NANOS): Spark's parquet reader does not model nanos natively;
      with the legacy conf it surfaces as long nanos, and we truncate to
      microsecond timestamps with integer arithmetic -- the same truncation
      DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP, so oracle comparisons
      stay exact.
    - TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false): Spark reads it as
      TIMESTAMP_NTZ, which `unix_micros`/interval arithmetic reject; we cast
      to TIMESTAMP. The cast reinterprets the wall-clock fields in the session
      TZ (UTC here), which is exactly how DuckDB's `epoch_us` treats the same
      values, so oracle parity holds.
    - already TIMESTAMP: passthrough.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        # Scope the nanos-as-long conf to this read so other parquet reads in
        # the session keep their native timestamp behavior.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            path = f"{sf_dir}/{name}.parquet"
            df = spark.read.parquet(path)
            dtype = dict(df.dtypes).get("ts")
            if dtype == "bigint":
                # A long ts is only nanoseconds when the parquet logical
                # type says so (the nanosAsLong conf surfaces exactly that
                # case); a genuinely integer ts column must not be divided.
                # Inspect the footer rather than inferring units from the
                # Spark dtype alone (ADVICE r2).
                if _parquet_ts_is_nanos(path):
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
            elif dtype == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            return df
        finally:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_temp_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view so jobs can use spark.sql(...)."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
