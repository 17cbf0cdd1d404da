from electricity_forecast_pipeline_airflow_k8s_spark.operators.profile import quality_profile  # noqa: F401
