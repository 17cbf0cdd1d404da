"""Drive the driver contract end-to-end (the project verify recipe):
entry() smoke + every queries() entry vs its DuckDB oracle at sf0.01.

Comparison is DRIVER-PARITY: both sides are materialized as pandas frames,
columns sorted by name, rows sorted by all columns, and compared with
exact values AND pandas dtypes (the round-1 driver hash-failed 7 queries
on dtype-only differences -- DuckDB HUGEINT->float64 vs Spark int64 --
that a value-level comparison masks). Array/map/struct output columns are
rejected outright: the driver's pandas canonicalizer cannot sort them
(round-1 `unhashable type: 'list'` crash).

Usage: python tools/verify_contract.py [sf_dir] [name_prefix...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: name-sorted columns, value-sorted rows.

    Timestamps are normalized to datetime64[us] on both sides (Spark Arrow
    and DuckDB pandas exports differ only in declared unit); every other
    dtype is preserved and compared exactly.
    """
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            # width-insensitive like the driver (round-1 evidence: int32
            # rank()/length() columns hash-matched int64 oracles); int vs
            # float stays a hard mismatch
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object and df[c].map(lambda v: isinstance(v, (list, dict))).any():
            raise TypeError(f"unsortable nested values in column {c!r}")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    dt_a, dt_b = [str(t) for t in a.dtypes], [str(t) for t in b.dtypes]
    if dt_a != dt_b:
        diff = [
            f"{c}: spark={x} oracle={y}"
            for c, x, y in zip(a.columns, dt_a, dt_b)
            if x != y
        ]
        return False, "dtype mismatch " + "; ".join(diff)
    try:
        pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=True)
    except AssertionError as exc:
        return False, str(exc).splitlines()[0]
    return True, ""


NESTED = ("array", "map", "struct")


def main(sf: str = "/root/testdata/sf0.01", *prefixes: str) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
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

    names = [n for n in qs if not prefixes or any(n.startswith(p) for p in prefixes)]
    bad = []
    for name in names:
        sdf = qs[name](spark, sf)
        nested = [
            f.name for f in sdf.schema.fields if f.dataType.typeName() in NESTED
        ]
        if nested:
            print(name, "NESTED-COLUMNS", nested)
            bad.append(name)
            continue
        if name not in osql:
            print(name, "rows_only", sdf.count())
            continue
        spdf = canon(sdf.toPandas())
        ddf = canon(con.execute(osql[name]).df())
        if len(spdf) != len(ddf):
            print(name, f"ROWCOUNT {len(spdf)} != {len(ddf)}")
            bad.append(name)
            continue
        ok, why = frames_equal(spdf, ddf)
        print(name, "MATCH" if ok else f"MISMATCH {why}", len(spdf))
        if not ok:
            bad.append(name)
            with pd.option_context("display.max_columns", None, "display.width", 200):
                print("  spark:", spdf.head(2).to_string())
                print("  duck :", ddf.head(2).to_string())
    if bad:
        print("FAILED:", bad)
        return 1
    n_oracle = len([n for n in names if n in osql])
    print(f"OK: {n_oracle} oracle-matched, {len(names) - n_oracle} rows-only")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
