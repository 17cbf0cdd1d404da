"""Validation / profiling queries over the `events` table (the driver's
stand-in for the electricity series: ts~period, event_type~respondent,
value~value). Each maps one or more SURVEY §2 inventory rows."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.profile import (
    profile_oracle_sql,
    quality_profile,
)
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table

# events.ts is TIMESTAMP_NS in the parquet; truncate to microseconds in the
# oracle exactly as the Spark loader does (sources/tables.py).
EVENTS_SRC = "(SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props FROM events)"


# -- flagship: the whole quality pass in one statement (SURVEY §7.1) --------
@register("quality_profile", oracle=profile_oracle_sql(table=EVENTS_SRC))
def q_quality_profile(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return quality_profile(ev, group_col="event_type", ts_col="ts", value_col="value")
