"""Hand-model pins for the round-6 operators: tiny synthetic inputs with
independently hand-computed answers (the oracle parity is engine-vs-engine;
these pin the SEMANTICS)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries


def _write_events(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


BASE = dt.datetime(2024, 1, 1)


def test_window_funnel_hand_model(spark, tmp_path):
    """u1: v -> c(+30m) -> p(+60m) all inside 2h => level 3.
    u2: v -> c(+3h) outside window => level 1.
    u3: v -> c(+30m), p before the click only => level 2."""
    rows = [
        (1, BASE, 1, "view", 1.0, "{}"),
        (2, BASE + dt.timedelta(minutes=30), 1, "click", 1.0, "{}"),
        (3, BASE + dt.timedelta(minutes=60), 1, "purchase", 1.0, "{}"),
        (4, BASE, 2, "view", 1.0, "{}"),
        (5, BASE + dt.timedelta(hours=3), 2, "click", 1.0, "{}"),
        (6, BASE, 3, "purchase", 1.0, "{}"),
        (7, BASE + dt.timedelta(minutes=10), 3, "view", 1.0, "{}"),
        (8, BASE + dt.timedelta(minutes=40), 3, "click", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        r["funnel_level"]: r["n_users"]
        for r in queries()["sess_window_funnel"](spark, sf).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}, got


def test_mutual_information_hand_model(spark, tmp_path):
    """Perfectly dependent X/Y (each type occupies its own hour):
    MI == H(X) == H(Y) == 1 bit for two equal classes; NMI == 1."""
    rows = []
    for i in range(10):
        rows.append((i, BASE.replace(hour=1), 1, "a", 1.0, "{}"))
        rows.append((100 + i, BASE.replace(hour=2), 1, "b", 1.0, "{}"))
    sf = _write_events(tmp_path, rows)
    r = queries()["val_mutual_information"](spark, sf).collect()[0]
    assert r["mi_bits"] == 1.0
    assert r["hx_bits"] == 1.0 and r["hy_bits"] == 1.0
    assert r["normalized_mi"] == 1.0
    assert r["joint_entropy_bits"] == 1.0  # H(X,Y) = H(X) here


def test_mutual_information_independent_is_zero(spark, tmp_path):
    """Independent X/Y (both types uniform over both hours) => MI 0."""
    rows = []
    i = 0
    for t in ("a", "b"):
        for h in (1, 2):
            for _ in range(5):
                rows.append((i, BASE.replace(hour=h), 1, t, 1.0, "{}"))
                i += 1
    sf = _write_events(tmp_path, rows)
    r = queries()["val_mutual_information"](spark, sf).collect()[0]
    assert r["mi_bits"] == 0.0
    assert r["normalized_mi"] == 0.0


def test_sssp_hand_model(spark, tmp_path):
    """Line graph 1-2-3 via co-occurrence hours: users 1,2 share 2 hours
    (w = 50), users 2,3 share 1 hour (w = 100); source = 1 =>
    dist(1)=0, dist(2)=50, dist(3)=150."""
    rows = [
        # hour 0 and hour 1: users 1,2 co-occur (error events)
        (1, BASE.replace(hour=0), 1, "error", 1.0, "{}"),
        (2, BASE.replace(hour=0), 2, "error", 1.0, "{}"),
        (3, BASE.replace(hour=1), 1, "error", 1.0, "{}"),
        (4, BASE.replace(hour=1), 2, "error", 1.0, "{}"),
        # hour 2: users 2,3 co-occur
        (5, BASE.replace(hour=2), 2, "error", 1.0, "{}"),
        (6, BASE.replace(hour=2), 3, "error", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        r["dist"]: (r["n_nodes"], r["min_node"])
        for r in queries()["graph_sssp_weighted"](spark, sf).collect()
    }
    assert got == {0: (1, 1), 50: (1, 2), 150: (1, 3)}, got


def test_psi_weekly_trend_identical_weeks_is_zero(spark, tmp_path):
    """Two weeks with the identical value distribution => PSI 0 for both
    (baseline week included, by definition 0)."""
    rows = []
    i = 0
    for week in (0, 1):
        for v in (10.0, 30.0, 50.0, 170.0):
            rows.append(
                (i, BASE + dt.timedelta(weeks=week), 1, "a", v, "{}")
            )
            i += 1
    sf = _write_events(tmp_path, rows)
    out = queries()["ts_psi_weekly_trend"](spark, sf).collect()
    assert len(out) == 2
    assert all(r["psi"] == 0.0 for r in out), out


def test_simpson_reversal_hand_model(spark, tmp_path):
    """Classic construction: within each stratum y DECREASES with x, but
    stratum means shift so the pooled slope INCREASES => both strata
    flagged reversed."""
    rows = []
    i = 0
    # stratum a: hours 1,2 with y 10 -> 9 (slope -1)
    for h, y in [(1, 10.0), (2, 9.0)]:
        rows.append((i, BASE.replace(hour=h), 1, "a", y, "{}")); i += 1
    # stratum b: hours 11,12 with y 30 -> 29 (slope -1); pooled slope > 0
    for h, y in [(11, 30.0), (12, 29.0)]:
        rows.append((i, BASE.replace(hour=h), 1, "b", y, "{}")); i += 1
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r for r in queries()["val_simpson_slope_reversal"](spark, sf).collect()}
    assert out["a"]["group_slope"] == -1.0 and out["b"]["group_slope"] == -1.0
    assert out["a"]["pooled_slope"] > 0
    assert out["a"]["reversed"] and out["b"]["reversed"]


def test_cosine_pair_histogram_hand_model(spark, tmp_path):
    """Orthogonal pair => cos 0 (bucket 0); identical pair => cos 1
    (clamped into bucket 9)."""
    import pandas as pd

    vecs = []
    # ids 0 and 97 orthogonal; ids 1 and 98 identical
    vecs.append({"vec_id": 0, "embedding": [1.0, 0.0], "label": 0})
    vecs.append({"vec_id": 97, "embedding": [0.0, 1.0], "label": 0})
    vecs.append({"vec_id": 1, "embedding": [1.0, 2.0], "label": 0})
    vecs.append({"vec_id": 98, "embedding": [2.0, 4.0], "label": 0})
    pd.DataFrame(vecs).to_parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        r["bucket"]: r["n_pairs"]
        for r in queries()["emb_cosine_pair_histogram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {0: 1, 9: 1}, got
