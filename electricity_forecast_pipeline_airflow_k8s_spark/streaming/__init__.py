from electricity_forecast_pipeline_airflow_k8s_spark.streaming.ingest import (  # noqa: F401
    dedup_late_data,
    incremental_ingest,
    session_windows,
    stream_quality_counts,
    windowed_stats,
)
from electricity_forecast_pipeline_airflow_k8s_spark.streaming.stateful import (  # noqa: F401
    running_anomalies,
)
