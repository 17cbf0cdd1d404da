from electricity_forecast_pipeline_airflow_k8s_spark.streaming.ingest import (  # noqa: F401
    dedup_late_data,
    session_windows,
    stream_quality_counts,
    windowed_stats,
)
