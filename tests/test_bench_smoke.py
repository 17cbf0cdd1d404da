"""Bench smoke gate (VERDICT r2 item 5): every bench.py HEADLINE query
must build and materialize at sf0.001 through the same noop sink the bench
uses. Round 2's bench crashed (rc 1, no timings) on a loader regression
that this test now catches locally before the driver's per-round bench
run ever sees it.
"""

import pytest

import bench
from electricity_forecast_pipeline_airflow_k8s_spark.queries import (
    queries as all_queries,
)


@pytest.mark.parametrize("name", bench.HEADLINE)
def test_headline_query_materializes(spark, sf_dir, name):
    qs = all_queries()
    assert name in qs, f"bench HEADLINE references unregistered query {name!r}"
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
