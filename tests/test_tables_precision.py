"""Fixture-precision regression tests for the events table loader.

Round-2 postmortem: the driver regenerated `events.parquet` at microsecond
precision (TIMESTAMP(MICROS, isAdjustedToUTC=false)), Spark surfaced `ts`
as TIMESTAMP_NTZ, and every `unix_micros(ts)` consumer crashed because the
loader only handled the legacy nanos-as-bigint case. These tests write the
same rows at nano, micro, and native-UTC precision and pin that
`load_table` yields a session-TZ `timestamp` column with identical gap
semantics for all three — so a fixture precision drift can never break the
build silently again.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import load_table

ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0, 0), 10, "a", 1.0, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 0, 30, 500000), 10, "a", 2.0, "{}"),
    (3, datetime.datetime(2024, 1, 1, 0, 2, 0, 250000), 11, "b", 3.0, "{}"),
]


def _write_events(path: str, ts_type: pa.DataType) -> str:
    cols = list(zip(*ROWS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1]).cast(ts_type),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, f"{path}/events.parquet")
    return path


@pytest.mark.parametrize(
    "label,ts_type",
    [
        ("nanos", pa.timestamp("ns")),
        ("micros", pa.timestamp("us")),
        ("micros_utc", pa.timestamp("us", tz="UTC")),
        ("millis", pa.timestamp("ms")),
    ],
)
def test_events_ts_loads_as_timestamp(spark, tmp_path, label, ts_type):
    sf_dir = _write_events(str(tmp_path), ts_type)
    df = load_table(spark, "events", sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp", f"{label}: got {dict(df.dtypes)['ts']}"
    # unix_micros is the downstream consumer that crashed in round 2 — it
    # must resolve, and gap values must be precision-independent.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("ts")
    gaps = sorted(
        r[0]
        for r in df.select(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us")
        ).collect()
        if r[0] is not None
    )
    assert gaps == [30_500_000, 89_750_000], f"{label}: gaps {gaps}"


def test_events_nanos_conf_restored(spark, tmp_path):
    """The nanos-as-long conf must not leak past load_table (ADVICE r2):
    whatever the conf was before the read, it must be after."""
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(conf_key)
    _write_events(str(tmp_path), pa.timestamp("ns"))
    load_table(spark, "events", str(tmp_path))
    assert spark.conf.get(conf_key, None) in (None, "false")
    # and a preexisting explicit value is restored, not clobbered
    spark.conf.set(conf_key, "false")
    load_table(spark, "events", str(tmp_path))
    assert spark.conf.get(conf_key, None) == "false"


def test_events_plain_int64_ts_not_corrupted(spark, tmp_path):
    """A genuinely integer ts column (no TIMESTAMP logical type) must pass
    through untouched -- the nanos div-1000 conversion applies only when
    the parquet footer declares TIMESTAMP(NANOS) (ADVICE r2)."""
    micros = [1_704_067_200_000_000, 1_704_067_230_500_000]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(micros, pa.int64()),
            "user_id": pa.array([10, 10], pa.int64()),
            "event_type": pa.array(["a", "a"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, f"{tmp_path}/events.parquet")
    df = load_table(spark, "events", str(tmp_path))
    assert dict(df.dtypes)["ts"] == "bigint"
    assert sorted(r["ts"] for r in df.select("ts").collect()) == micros


def test_footer_check_raises_on_unreadable_footer(tmp_path, monkeypatch):
    """An unreadable footer for a bigint ts must be an error, not a silent
    nanos guess (ADVICE r3): either wrong guess corrupts the column."""
    from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import (
        _parquet_ts_is_nanos,
    )

    missing = str(tmp_path / "does_not_exist.parquet")
    monkeypatch.delenv("SPARK_GRAFT_BIGINT_TS", raising=False)
    with pytest.raises(ValueError, match="parquet footer"):
        _parquet_ts_is_nanos(missing)
    # the documented escape hatch for footer-unreachable filesystems
    monkeypatch.setenv("SPARK_GRAFT_BIGINT_TS", "ns")
    assert _parquet_ts_is_nanos(missing) is True
    monkeypatch.setenv("SPARK_GRAFT_BIGINT_TS", "raw")
    assert _parquet_ts_is_nanos(missing) is False


def test_prepare_job_does_not_divide_plain_int64_ts(spark, tmp_path):
    """jobs.prepare_job must route its bigint-ts conversion through the
    same footer check as load_table (ADVICE r3): a genuine int64 ts fed to
    the job is not divided by 1000."""
    from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import (
        _parquet_ts_is_nanos,
    )

    micros = [1_704_067_200_000_000, 1_704_067_230_500_000]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(micros, pa.int64()),
        }
    )
    path = str(tmp_path / "raw.parquet")
    pq.write_table(table, path)
    assert _parquet_ts_is_nanos(path) is False
    # and a real nanos footer still converts
    ts = [datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2)]
    table_ns = pa.table({"ts": pa.array(ts).cast(pa.timestamp("ns"))})
    path_ns = str(tmp_path / "raw_ns.parquet")
    pq.write_table(table_ns, path_ns)
    assert _parquet_ts_is_nanos(path_ns) is True
