"""Scalar/array helper expressions shared across operators (SURVEY §2.8).

Everything here returns Column expressions built from pyspark.sql.functions
-- JVM-side, codegen-friendly, UDF-free.
"""

from electricity_forecast_pipeline_airflow_k8s_spark.functions.arrays import (  # noqa: F401
    as_double,
    cosine,
    dot,
    norm,
)
from electricity_forecast_pipeline_airflow_k8s_spark.functions.timeutil import (  # noqa: F401
    gap_seconds,
    interval_micros,
)
from electricity_forecast_pipeline_airflow_k8s_spark.functions.hashing import (  # noqa: F401
    stable_hash,
    hex_nibble,
)
from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (  # noqa: F401
    exact_mean,
    exact_mean_sql,
)
