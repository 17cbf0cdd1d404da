"""Schedulable job entrypoints: prepare (with drift report) -> train over
the snapshot lake, end to end -- and the CLI surface itself."""

import pytest
import os
import json
import subprocess
import sys

from electricity_forecast_pipeline_airflow_k8s_spark.jobs import prepare_job, train_job


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~15 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_prepare_then_train_jobs(spark, sf_dir, tmp_path):
    lake = f"file://{tmp_path}/lake"
    out = prepare_job(spark, f"{sf_dir}/events.parquet", lake, run_ts="20240101_000000")
    assert out["record_count"] > 0
    assert out["validated_path"] is not None
    assert out["snapshots"] == ["20240101_000000"]
    assert set(out["drift"]["psi"]) == {"click", "error", "purchase", "signup", "view"}
    assert all(v is not None for v in out["drift"]["ks"].values())
    json.dumps(out, default=str)

    res = train_job(spark, lake, lookback=24, horizon=6)
    assert res["n_forecast_rows"] == 6
    assert res["metrics"]["rmse"] is not None
    # forecasts land in the lake (no driver collect); report carries path
    assert spark.read.parquet(res["forecast_path"]).count() == 6
    # registry publication: the trained params are the new latest version
    from electricity_forecast_pipeline_airflow_k8s_spark.ml.registry import (
        latest_version,
        load_model,
    )

    assert res["model_version"] == 1
    assert latest_version(spark, lake, res["model_name"]) == 1
    assert load_model(spark, lake, res["model_name"]).count() > 0

    # a second run registers version 2
    res2 = train_job(spark, lake, lookback=24, horizon=6)
    assert res2["model_version"] == 2


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~50 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_cli_prepare(tmp_path, sf_dir):
    lake = f"file://{tmp_path}/clilake"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "electricity_forecast_pipeline_airflow_k8s_spark.jobs",
            "prepare",
            "--input",
            f"{sf_dir}/events.parquet",
            "--lake",
            lake,
            "--run-ts",
            "20240102_000000",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["record_count"] > 0
