"""Local DuckDB-oracle parity harness -- mirrors the driver's t2 check
(row-count + schema + order-insensitive value compare) so every query is
validated before the driver ever runs it."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
from pyspark.sql import SparkSession

from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry
from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill float noise below ~1e-9 relative
        return float(f"{v:.9g}")
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def compare(spark: SparkSession, name: str, sf_dir: str) -> dict:
    q = registry()[name]
    sdf = q.build(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        return {"name": name, "mode": "rows_only", "rows": len(s_rows), "ok": len(s_rows) >= 0}

    con = duck_connect(sf_dir)
    try:
        cur = con.execute(q.oracle)
        d_cols = [d[0] for d in cur.description]
        d_rows = [tuple(r) for r in cur.fetchall()]
    finally:
        con.close()

    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    res = {
        "name": name,
        "mode": "oracle",
        "rows": len(sr),
        "oracle_rows": len(dr),
        "schema_ok": sc == dc,
        "count_ok": len(sr) == len(dr),
        "values_ok": sr == dr,
    }
    res["ok"] = res["schema_ok"] and res["count_ok"] and res["values_ok"]
    if not res["ok"]:
        res["spark_cols"] = sc
        res["duck_cols"] = dc
        mism = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        res["first_mismatches"] = mism
        res["spark_sample"] = sr[:2]
        res["duck_sample"] = dr[:2]
    return res
