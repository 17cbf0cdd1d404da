"""Every registered query must match its DuckDB oracle at sf0.001 --
the local mirror of the driver's t2 correctness gate."""

import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.parity import compare
from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry


def all_query_names():
    return sorted(registry().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare(spark, name, sf_dir)
    assert res["ok"], res
