"""IO surface (SURVEY §2.1 S5-S8): CSV/JSON/Parquet sinks + scans with the
coercing schema normalization on re-read (the reference round-trips CSV
through MinIO and re-parses timestamps every read; we verify lossless
typed round-trips)."""

import datetime as dt

from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.sources.normalize import (
    events_as_readings,
    normalize_readings,
)
from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import load_table


def _sample(spark):
    rows = [
        (dt.datetime(2024, 1, 1, h), "CAL", "D", 1000.0 + h) for h in range(24)
    ]
    return spark.createDataFrame(
        rows, "period timestamp, respondent string, type string, value double"
    )


def test_csv_roundtrip_with_normalization(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "csv_out")
    df.write.option("header", True).mode("overwrite").csv(path)
    back = spark.read.option("header", True).csv(path)  # all strings
    normalized = normalize_readings(back)
    assert dict(normalized.dtypes)["period"] == "timestamp"
    assert dict(normalized.dtypes)["value"] == "double"
    assert normalized.count() == 24
    s1 = df.agg(F.sum("value")).collect()[0][0]
    s2 = normalized.agg(F.sum("value")).collect()[0][0]
    assert s1 == s2


def test_coerce_semantics_junk_to_null(spark):
    """pd.to_numeric(errors='coerce') / to_datetime equivalence: junk -> NULL
    (`core/data_extraction.py:114-115`)."""
    raw = spark.createDataFrame(
        [
            ("2024-01-01T00:00:00", "CAL", "D", "123.5"),
            ("not-a-date", "CAL", "D", "junk"),
        ],
        "period string, respondent string, type string, value string",
    )
    out = normalize_readings(raw).collect()
    good = [r for r in out if r["value"] is not None]
    bad = [r for r in out if r["value"] is None]
    assert len(good) == 1 and good[0]["value"] == 123.5
    assert len(bad) == 1 and bad[0]["period"] is None


def test_extra_columns_pass_through(spark):
    """strict=False: undeclared columns carried untouched
    (`core/data_validation.py:68`)."""
    raw = spark.createDataFrame(
        [("2024-01-01", "CAL", "D", "1.0", "California", "megawatthours")],
        "period string, respondent string, type string, value string, "
        "`respondent-name` string, `value-units` string",
    )
    out = normalize_readings(raw)
    assert "respondent-name" in out.columns and "value-units" in out.columns
    assert out.collect()[0]["value-units"] == "megawatthours"


def test_json_report_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "json_out")
    df.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    assert back.count() == 24
    # json loses timestamp typing; normalization restores it
    restored = normalize_readings(back)
    assert dict(restored.dtypes)["period"] == "timestamp"


def test_events_as_readings_mapping(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    r = events_as_readings(ev)
    assert set(r.columns) == {"period", "respondent", "value"}
    assert r.count() == ev.count()


def test_orc_roundtrip_preserves_normalized_frame(spark, tmp_path):
    """ORC is the other columnar format Spark ships natively: a
    normalized frame written as ORC must read back value-identical
    (schema + rows), same contract as the CSV/JSON round-trips."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, -2.25)],
        "id long, name string, score double",
    ).withColumn("flag", F.col("id") % 2 == 0)
    path = str(tmp_path / "roundtrip.orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
