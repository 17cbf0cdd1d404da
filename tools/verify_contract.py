"""Drive the driver contract end-to-end (the project verify recipe):
entry() smoke + every queries() entry vs its DuckDB oracle at sf0.01.

Usage: python tools/verify_contract.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import TABLES  # noqa: E402


def norm(v):
    if isinstance(v, float):
        return float(f"{v:.9g}")
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main(sf: str = "/root/testdata/sf0.01") -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("driver-sim")
        .getOrCreate()
    )
    rows = E.entry(spark).collect()
    print("entry rows:", len(rows))
    assert rows, "entry() returned no rows"

    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs), "oracle_sql keys must be a subset of queries"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    bad = []
    for name in sorted(osql):
        sdf = qs[name](spark, sf)
        scols = sorted(sdf.columns)
        srows = sorted(
            [tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=str
        )
        cur = con.execute(osql[name])
        cols = [d[0] for d in cur.description]
        idx = [cols.index(c) for c in sorted(cols)]
        drows = sorted(
            [tuple(norm(r[i]) for i in idx) for r in cur.fetchall()], key=str
        )
        ok = scols == sorted(cols) and srows == drows
        print(name, "MATCH" if ok else "MISMATCH", len(srows))
        if not ok:
            bad.append(name)
            print("  spark:", srows[:2])
            print("  duck :", drows[:2])
    for name in sorted(set(qs) - set(osql)):
        print(name, "rows_only", qs[name](spark, sf).count())
    if bad:
        print("FAILED:", bad)
        return 1
    print(f"OK: {len(osql)} oracle-matched, {len(qs) - len(osql)} rows-only")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
