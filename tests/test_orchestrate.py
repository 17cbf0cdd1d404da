"""DAG runner semantics (Airflow-analog: topological order, retries,
upstream_failed propagation, XCom result passing) and the end-to-end
electricity chain over sf0.001 (`core/airflow_dag.py:736-778`)."""

from __future__ import annotations

import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.orchestrate import (
    Task,
    electricity_dag,
    run_dag,
)


def test_topological_order_deterministic():
    seen = []

    def mk(name):
        return lambda ctx, results: seen.append(name)

    tasks = [
        Task("c", mk("c"), deps=("a", "b")),
        Task("b", mk("b"), deps=("a",)),
        Task("a", mk("a")),
        Task("d", mk("d"), deps=("a",)),
    ]
    report = run_dag(tasks)
    assert report.ok
    assert seen == ["a", "b", "c", "d"]  # ready-set ties broken by name


def test_results_pass_downstream_like_xcom():
    tasks = [
        Task("extract", lambda ctx, r: 42),
        Task("double", lambda ctx, r: r["extract"] * 2, deps=("extract",)),
    ]
    report = run_dag(tasks)
    assert report.results["double"] == 84


def test_retries_then_success():
    calls = {"n": 0}

    def flaky(ctx, r):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    report = run_dag([Task("flaky", flaky, retries=2)])
    assert report.ok
    assert report.tasks["flaky"].attempts == 3


def test_failure_marks_transitive_downstream_upstream_failed():
    def boom(ctx, r):
        raise RuntimeError("boom")

    tasks = [
        Task("a", lambda ctx, r: 1),
        Task("b", boom, deps=("a",)),
        Task("c", lambda ctx, r: 2, deps=("b",)),
        Task("d", lambda ctx, r: 3, deps=("c",)),
        Task("e", lambda ctx, r: 4, deps=("a",)),  # sibling still runs
    ]
    report = run_dag(tasks)
    assert not report.ok
    assert report.tasks["b"].state == "failed"
    assert "RuntimeError" in report.tasks["b"].error
    assert report.tasks["c"].state == "upstream_failed"
    assert report.tasks["d"].state == "upstream_failed"
    assert report.tasks["e"].state == "success"
    assert "c" not in report.results


def test_cycle_and_unknown_dep_raise_before_running():
    ran = {"any": False}

    def mark(ctx, r):
        ran["any"] = True

    with pytest.raises(ValueError, match="cycle"):
        run_dag([Task("a", mark, deps=("b",)), Task("b", mark, deps=("a",))])
    with pytest.raises(ValueError, match="unknown"):
        run_dag([Task("a", mark, deps=("ghost",))])
    with pytest.raises(ValueError, match="duplicate"):
        run_dag([Task("a", mark), Task("a", mark)])
    assert not ran["any"]


def test_electricity_dag_end_to_end(spark, sf_dir, tmp_path):
    root = str(tmp_path / "lake")
    tasks = electricity_dag(spark, sf_dir, root, run_ts="20240101_000000")
    report = run_dag(tasks, ctx={"spark": spark})
    assert report.ok, {n: (t.state, t.error) for n, t in report.tasks.items()}
    summary = report.results["notify"]
    assert summary["validated"] is True
    assert summary["records"] > 0
    assert summary["groups_profiled"] == 5
    assert summary["model_version"] == 1
    assert set(summary["metrics"]) >= {"rmse", "mae"}
    # snapshots on disk for every prefix the reference writes
    import os

    for prefix in ("raw", "processed", "reports"):
        assert os.path.isdir(f"{root}/{prefix}/run_ts=20240101_000000"), prefix


def test_electricity_dag_failure_path(spark, sf_dir, tmp_path, monkeypatch):
    """A failing prepare must mark train/register/cleanup/notify
    upstream_failed while the quality summary (parallel branch) still
    runs -- the Airflow failure semantics, not a crash."""
    root = str(tmp_path / "lake")
    tasks = electricity_dag(spark, sf_dir, root, run_ts="20240101_000000")

    def boom(ctx, results):
        raise RuntimeError("storage down")

    tasks = [
        Task(t.name, boom, deps=t.deps) if t.name == "prepare" else t
        for t in tasks
    ]
    report = run_dag(tasks)
    assert report.tasks["prepare"].state == "failed"
    assert report.tasks["quality_summary"].state == "success"
    for name in ("train", "register", "cleanup", "notify"):
        assert report.tasks[name].state == "upstream_failed", name
