"""Query definitions, grouped by SURVEY.md §2 category. Importing this
package registers every query into the registry."""

from electricity_forecast_pipeline_airflow_k8s_spark.querydefs import (  # noqa: F401
    corpus,
    graph,
    incremental,
    layout,
    mlops,
    pq,
    relational,
    relational2,
    relational3,
    sessions,
    stats5,
    stats6,
    stats7,
    streammerge,
    textops,
    textops2,
    tpch_sql,
    timeseries,
    timeseries2,
    validation,
)
