from electricity_forecast_pipeline_airflow_k8s_spark.ml.forecast import (  # noqa: F401
    fit_per_group,
    predict_per_group,
)
from electricity_forecast_pipeline_airflow_k8s_spark.ml.metrics import forecast_metrics  # noqa: F401
