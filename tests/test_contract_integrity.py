"""Registry-wide contract invariants, cheap enough to run every time:
every verification-window name resolves, names are unique, and every
oracle is valid DuckDB SQL (EXPLAIN against empty same-schema views --
catches typos in oracles the driver's 50-query window won't reach this
round without paying execution cost)."""

from __future__ import annotations

import duckdb
import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.queries import (
    _VERIFICATION_WINDOW,
    registry,
)
from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


def test_window_names_resolve_and_unique():
    reg = registry()
    missing = [n for n in _VERIFICATION_WINDOW if n not in reg]
    assert not missing, missing
    assert len(_VERIFICATION_WINDOW) == len(set(_VERIFICATION_WINDOW))


def test_registry_is_window_prefixed():
    names = list(registry())
    assert tuple(names[: len(_VERIFICATION_WINDOW)]) == _VERIFICATION_WINDOW


def test_every_oracle_explains_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet' LIMIT 0"
        )
    bad = {}
    for name, q in registry().items():
        if q.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {q.oracle}")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e).splitlines()[0]
    assert not bad, bad


def test_rows_only_count_is_bounded():
    """VERDICT r5 item 8: at most 2 registry entries without an oracle."""
    rows_only = [n for n, q in registry().items() if q.oracle is None]
    assert len(rows_only) <= 2, rows_only


def test_committed_sweep_ledger_is_green_for_whole_registry():
    """VERDICT r10 item 4: the committed round record must show value-level
    evidence for EVERY lane -- including the two ML lanes whose oracle is
    the NumPy replay (the driver channel can only print `no_oracle` for
    them). BENCH_LEDGER/verify_sweep.json is written/merged by
    tools/verify_contract.py; every registry lane must be present with a
    green status (MATCH or NUMPY-MATCH)."""
    import json
    import os

    from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "BENCH_LEDGER", "verify_sweep.json")
    with open(path) as f:
        lanes = json.load(f)["lanes"]
    reg = set(registry())
    missing = reg - set(lanes)
    assert not missing, f"lanes with no committed sweep status: {sorted(missing)}"
    red = {n: r["status"] for n, r in lanes.items() if r["status"] not in ("MATCH", "NUMPY-MATCH")}
    assert not red, f"non-green sweep statuses: {red}"
    stale = sorted(set(lanes) - reg)
    assert not stale, f"sweep statuses for unregistered lanes: {stale}"
