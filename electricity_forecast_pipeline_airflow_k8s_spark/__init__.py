"""PySpark-native analytics engine with the data-processing capabilities of
the reference electricity-forecast pipeline (Saoudyahya/
electricity-forecast-pipeline-airflow-k8s), re-expressed Spark-first.

The reference (see SURVEY.md) is a single-node pandas ETL + ML pipeline;
this package provides the same relational/validation/time-series/ML-prep
semantics as declarative PySpark DataFrame plans that Catalyst can optimize,
plus large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Layout:
    session     -- tuned SparkSession builder
    sources     -- readers/writers, schema normalization, snapshots, REST scan
    operators   -- validation, profiling, time-series, dedup, similarity, text
    functions   -- scalar/array helper column expressions
    plans       -- partitioning/skew/explain helpers
    ml          -- grouped per-key model fit/predict at the pandas-UDF edge
    streaming   -- Structured Streaming surface (watermark dedup, windows)
"""

__version__ = "0.1.0"

from electricity_forecast_pipeline_airflow_k8s_spark.session import get_spark  # noqa: F401
