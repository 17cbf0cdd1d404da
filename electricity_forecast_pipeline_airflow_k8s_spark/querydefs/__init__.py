"""Query definitions, grouped by SURVEY.md §2 category. Importing this
package registers every query into the registry."""

from electricity_forecast_pipeline_airflow_k8s_spark.querydefs import (  # noqa: F401
    graph,
    layout,
    mlops,
    relational,
    relational2,
    relational3,
    round7,
    round8,
    round8b,
    round9,
    round10,
    sessions,
    stats5,
    stats6,
    stats7,
    textops,
    tpch_sql,
    timeseries,
    timeseries2,
    validation,
)
