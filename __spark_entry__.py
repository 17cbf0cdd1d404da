"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-group quality profile on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (see
electricity_forecast_pipeline_airflow_k8s_spark/querydefs/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from electricity_forecast_pipeline_airflow_k8s_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.queries()["quality_profile"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """Two queries() entries intentionally have no SQL oracle --
    ``ml_forecast_next`` and ``ml_train_eval_metrics`` (168-dim ridge
    train/infer; DuckDB cannot replay the fit). The driver records them
    rows-only (`no_oracle`), but they are NOT value-unverified: the sweep
    channel recomputes both from scratch in NumPy and value-compares at
    1e-3 (tools/verify_contract.py NUMPY_REPLAYS), with the latest green
    status committed per-lane in BENCH_LEDGER/verify_sweep.json and
    reduced-dimension oracle twins (`ml_forecast_next_lag1{,_h3}`,
    `ml_ridge_lag1_parity`) hash-matched in the ordinary channel."""
    return _q.oracle_sql()
