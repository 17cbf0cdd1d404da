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
