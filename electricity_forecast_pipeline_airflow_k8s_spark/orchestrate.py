"""Minimal dependency-ordered job orchestration (SURVEY §3, the
"Airflow schedules Spark jobs" shell).

The reference's Airflow DAG (`core/airflow_dag.py:736-778`) is a linear
PythonOperator chain -- extract >> validate >> quality_summary >>
compile_and_upload >> generate_params >> cleanup >> notify -- with
XCom result passing and per-task retries from default_args. This module
is that shell with zero scheduler dependency: a topological task runner
whose tasks are THIS engine's Spark jobs. Airflow/cron/K8s can still own
the clock (`jobs.py` exposes spark-submit CLIs); what lives here is the
intra-run dependency graph, retry, result passing, and the run report --
the parts of the DAG that are pipeline logic rather than scheduling.

Semantics mirrored from Airflow: a task runs only when every upstream
succeeded; failures mark all transitive downstreams ``upstream_failed``
(never silently skipped); a failed attempt retries up to ``retries``
times (`core/airflow_dag.py:41-47` default_args: retries=2); each task's
return value is available to downstreams by task name (XCom analog,
`core/airflow_dag.py:137-146` xcom_pull).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field
from graphlib import CycleError, TopologicalSorter
from typing import Any


@dataclass(frozen=True)
class Task:
    """One node: ``fn(ctx, results)`` where ``ctx`` is the shared run
    context (spark session, paths, config) and ``results`` maps upstream
    task names to their return values."""

    name: str
    fn: Callable[[Mapping[str, Any], Mapping[str, Any]], Any]
    deps: tuple[str, ...] = ()
    retries: int = 0


@dataclass
class TaskReport:
    state: str  # success | failed | upstream_failed
    attempts: int = 0
    seconds: float = 0.0
    error: str | None = None


@dataclass
class RunReport:
    tasks: dict[str, TaskReport] = field(default_factory=dict)
    results: dict[str, Any] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(t.state == "success" for t in self.tasks.values())


def run_dag(tasks: list[Task], ctx: Mapping[str, Any] | None = None) -> RunReport:
    """Execute the task graph in a deterministic topological order
    (ties broken by task name). Unknown deps and cycles raise before any
    task runs."""
    by_name = {t.name: t for t in tasks}
    if len(by_name) != len(tasks):
        raise ValueError("duplicate task names")
    for t in tasks:
        missing = [d for d in t.deps if d not in by_name]
        if missing:
            raise ValueError(f"task {t.name!r} depends on unknown {missing}")
    ts = TopologicalSorter({t.name: set(t.deps) for t in tasks})
    try:
        order = list(ts.static_order())
    except CycleError as e:
        raise ValueError(f"dependency cycle: {e.args[1]}") from e
    # static_order is stable for ready-sets only per insertion; enforce a
    # deterministic total order: repeatedly take the lexicographically
    # smallest ready task
    done: set[str] = set()
    ordered: list[str] = []
    pending = set(by_name)
    while pending:
        ready = sorted(
            n for n in pending if all(d in done for d in by_name[n].deps)
        )
        ordered.append(ready[0])
        done.add(ready[0])
        pending.remove(ready[0])
    assert set(ordered) == set(order)

    ctx = dict(ctx or {})
    report = RunReport()
    for name in ordered:
        task = by_name[name]
        bad_up = [
            d
            for d in task.deps
            if report.tasks[d].state in ("failed", "upstream_failed")
        ]
        if bad_up:
            report.tasks[name] = TaskReport(state="upstream_failed")
            continue
        tr = TaskReport(state="failed")
        t0 = time.perf_counter()
        for attempt in range(task.retries + 1):
            tr.attempts = attempt + 1
            try:
                report.results[name] = task.fn(ctx, report.results)
                tr.state = "success"
                tr.error = None
                break
            except Exception as e:  # noqa: BLE001 -- task boundary
                tr.error = f"{type(e).__name__}: {e}"
        tr.seconds = round(time.perf_counter() - t0, 3)
        report.tasks[name] = tr
    return report


def electricity_dag(
    spark,
    sf_dir: str,
    root: str,
    run_ts: str | None = None,
    lookback: int = 24,
    horizon: int = 6,
    retention_keep: int = 10,
) -> list[Task]:
    """The reference DAG's task chain re-expressed over this engine
    (`core/airflow_dag.py:778`: extract >> validate >> quality_summary >>
    [train] >> cleanup >> notify), each node one of the engine's jobs:

      extract          events -> readings frame (ref extract_data :87-127)
      prepare          snapshot + validate + report (ref validate_data
                       :129-227; run_preparation owns the raising-on-error
                       semantics of the DAG's task failure)
      quality_summary  per-group quality profile (ref :420-478)
      train            per-group ridge fit + metrics (the Katib/KFP stage,
                       ref generate_pipeline_parameters :481-:568)
      register         versioned params in the model registry
      cleanup          snapshot retention (ref cleanup_old_files :570-631)
      notify           run summary dict (ref send_success_notification
                       :635-733) -- pure result assembly, no side channel
    """
    from pyspark.sql import functions as F

    from electricity_forecast_pipeline_airflow_k8s_spark.ml import registry as REG
    from electricity_forecast_pipeline_airflow_k8s_spark.pipeline import (
        run_preparation,
        run_training,
    )
    from electricity_forecast_pipeline_airflow_k8s_spark.sources.normalize import (
        events_as_readings,
    )
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.profile import (
        quality_profile,
    )
    from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import (
        load_table,
    )

    def t_extract(ctx, results):
        ev = load_table(spark, "events", sf_dir)
        return events_as_readings(ev)

    def t_prepare(ctx, results):
        return run_preparation(
            spark, results["extract"], root, run_ts, retention_keep
        )

    def t_quality(ctx, results):
        prof = quality_profile(results["extract"])
        return {r["respondent"]: r["n_rows"] for r in prof.collect()}

    def t_train(ctx, results):
        readings = spark.read.parquet(results["prepare"].validated_path)
        return run_training(
            spark, readings, lookback=lookback, horizon=horizon
        )

    def t_register(ctx, results):
        tr = results["train"]
        version = REG.register_model(
            spark, tr.params, root, "load-forecaster", tr.metrics
        )
        return version

    def t_cleanup(ctx, results):
        from electricity_forecast_pipeline_airflow_k8s_spark.sources.snapshots import (
            apply_retention,
        )

        deleted = []
        for prefix in ("raw", "processed", "reports"):
            deleted += apply_retention(spark, root, prefix, keep=retention_keep)
        return deleted

    def t_notify(ctx, results):
        prep = results["prepare"]
        return {
            "records": prep.record_count,
            "validated": prep.validated_path is not None,
            "groups_profiled": len(results["quality_summary"]),
            "model_version": results["register"],
            "metrics": results["train"].metrics,
            "snapshots_deleted": len(results["cleanup"]),
        }

    # the reference's default_args apply retries=2 to EVERY task in the
    # chain (core/airflow_dag.py:81), not just extract -- mirror that.
    return [
        Task("extract", t_extract, retries=2),
        Task("prepare", t_prepare, deps=("extract",), retries=2),
        Task("quality_summary", t_quality, deps=("extract",), retries=2),
        Task("train", t_train, deps=("prepare",), retries=2),
        Task("register", t_register, deps=("train",), retries=2),
        Task("cleanup", t_cleanup, deps=("register", "quality_summary"), retries=2),
        Task("notify", t_notify, deps=("cleanup",), retries=2),
    ]
