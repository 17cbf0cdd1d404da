"""Hand-model tests for the round-5 analytic additions: WOE/IV binning,
sequence pattern matching, Theil-Sen robustness, interpolation gap fill,
k-core peeling, and the spectral basis contract.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.graph import (
    _KCORE_K,
    _KCORE_UNROLL,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.timeseries2 import (
    _COS24,
    _SIN24,
)


def test_spectral_basis_is_unit_circle():
    # the embedded literals must be the exact driver-side trig values —
    # if someone regenerates them with a different convention the
    # identity cos^2+sin^2=1 and the k=0 anchor catch it
    assert _COS24[0] == 1.0 and _SIN24[0] == 0.0
    for c, s in zip(_COS24, _SIN24):
        assert c * c + s * s == pytest.approx(1.0, abs=1e-15)
    assert _COS24[6] == pytest.approx(0.0, abs=1e-15)  # quarter cycle
    assert _SIN24[6] == pytest.approx(1.0, abs=1e-15)


def test_theilsen_resists_single_outlier(spark):
    # daily series with slope 2, one wrecked day; OLS would move, the
    # pairwise-slope median must stay at 2 exactly
    rows = [
        ("t", dt.date(2020, 1, d + 1), 2.0 * d + (1000.0 if d == 3 else 0.0))
        for d in range(9)
    ]
    daily = spark.createDataFrame(rows, "event_type string, d date, v double")
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type")) & (F.col("b.d") > F.col("a.d")),
    ).select(
        ((F.col("b.v") - F.col("a.v")) / F.datediff(F.col("b.d"), F.col("a.d"))).alias(
            "slope"
        )
    )
    [r] = slopes.agg(F.median("slope").alias("m")).collect()
    assert r["m"] == pytest.approx(2.0)


def test_interp_hand_model(spark):
    # observed at hours 0 and 4 (values 10 and 18): hour 2 -> 14;
    # leading/trailing behavior covered by construction (no outer gaps)
    from pyspark.sql import Window

    t0 = dt.datetime(2020, 1, 1, 0)
    obs = spark.createDataFrame(
        [("g", t0, 10.0), ("g", t0 + dt.timedelta(hours=4), 18.0)],
        "event_type string, hour timestamp, v_obs double",
    )
    grid = spark.createDataFrame(
        [("g", t0 + dt.timedelta(hours=h)) for h in range(5)],
        "event_type string, hour timestamp",
    )
    joined = grid.join(obs, ["event_type", "hour"], "left")
    wp = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        0, Window.unboundedFollowing
    )
    oh = F.when(F.col("v_obs").isNotNull(), F.col("hour"))
    ctx = joined.select(
        "hour",
        "v_obs",
        F.last("v_obs", ignorenulls=True).over(wp).alias("pv"),
        F.last(oh, ignorenulls=True).over(wp).alias("ph"),
        F.first("v_obs", ignorenulls=True).over(wn).alias("nv"),
        F.first(oh, ignorenulls=True).over(wn).alias("nh"),
    )
    hrs = lambda x, y: ((F.unix_timestamp(y) - F.unix_timestamp(x)) / 3600).cast(  # noqa: E731
        "long"
    )
    interp = F.when(F.col("v_obs").isNotNull(), F.col("v_obs")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (hrs(F.col("ph"), F.col("hour")).cast("double") / hrs(F.col("ph"), F.col("nh")))
    )
    vals = {
        r["hour"].hour: r["iv"]
        for r in ctx.select("hour", interp.alias("iv")).collect()
    }
    assert vals == {0: 10.0, 1: 12.0, 2: 14.0, 3: 16.0, 4: 18.0}


def test_woe_iv_hand_model(spark):
    # one bin all good, one bin mixed: signs and totals are forced
    per_bin = spark.createDataFrame(
        [(0, 90, 10), (1, 10, 90)], "bin int, n_good long, n_bad long"
    )
    tot = per_bin.agg(
        F.sum("n_good").cast("double").alias("g"), F.sum("n_bad").cast("double").alias("b")
    )
    gs = (F.col("n_good") + 0.5) / (F.col("g") + 5.0)
    bs = (F.col("n_bad") + 0.5) / (F.col("b") + 5.0)
    rows = {
        r["bin"]: (r["woe"], r["iv"])
        for r in per_bin.crossJoin(F.broadcast(tot))
        .select("bin", F.log(gs / bs).alias("woe"), ((gs - bs) * F.log(gs / bs)).alias("iv"))
        .collect()
    }
    assert rows[0][0] > 0 and rows[1][0] < 0  # good-heavy bin: positive WOE
    assert rows[0][1] > 0 and rows[1][1] > 0  # IV terms always non-negative
    assert rows[0][0] == pytest.approx(-rows[1][0], rel=1e-9)  # symmetric fixture


def test_pattern_funnel_counting_semantics(spark):
    # leftmost non-overlapping: 'vcpvp' has 2 matches of vc*p ('vcp','vp');
    # 'vvp' -> 1 (second v consumed? no: leftmost match starts at first v?
    # regex vc*p on 'vvp': position 0 'v' then c* empty then needs p -> 'v'
    # fails at index1 ('v'); scan restarts at index 1: 'vp' matches -> 1
    df = spark.createDataFrame(
        [("a", "vcpvp"), ("b", "vvp"), ("c", "ppp"), ("d", "vcccp")],
        "user_id string, journey string",
    )
    got = {
        r["user_id"]: r["n"]
        for r in df.select(
            "user_id", F.regexp_count("journey", F.lit("vc*p")).alias("n")
        ).collect()
    }
    assert got == {"a": 2, "b": 1, "c": 0, "d": 1}


def test_kcore_unroll_margin_vs_fixture():
    # the oracle unrolls a fixed number of peels; peeling on the sf0.01
    # fixture must converge comfortably within it (recomputed here from
    # the parquet, independent of Spark)
    import duckdb
    from collections import defaultdict

    con = duckdb.connect()
    con.sql(
        "create view events as select * from "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    )
    edges = con.sql(
        """
        WITH b AS (SELECT DISTINCT date_trunc('hour', ts::TIMESTAMP) h, user_id
                   FROM events WHERE event_type='error'
                     AND ts IS NOT NULL AND user_id IS NOT NULL)
        SELECT DISTINCT a.user_id, c.user_id FROM b a
        JOIN b c ON a.h = c.h AND a.user_id < c.user_id
        """
    ).fetchall()
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    alive, iters = set(adj), 0
    while True:
        nxt = {v for v in alive if sum(1 for n in adj[v] if n in alive) >= _KCORE_K}
        iters += 1
        if nxt == alive:
            break
        alive = nxt
    assert iters <= _KCORE_UNROLL - 2, (
        f"fixture needs {iters} peels; unroll {_KCORE_UNROLL} leaves <2 margin"
    )


def test_kcore_fixed_point_is_true_core():
    # every node in the converged core has >= K neighbors INSIDE the core
    import duckdb
    from collections import defaultdict

    con = duckdb.connect()
    con.sql(
        "create view events as select * from "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    )
    edges = con.sql(
        """
        WITH b AS (SELECT DISTINCT date_trunc('hour', ts::TIMESTAMP) h, user_id
                   FROM events WHERE event_type='error'
                     AND ts IS NOT NULL AND user_id IS NOT NULL)
        SELECT DISTINCT a.user_id, c.user_id FROM b a
        JOIN b c ON a.h = c.h AND a.user_id < c.user_id
        """
    ).fetchall()
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    alive = set(adj)
    while True:
        nxt = {v for v in alive if sum(1 for n in adj[v] if n in alive) >= _KCORE_K}
        if nxt == alive:
            break
        alive = nxt
    for v in alive:
        assert sum(1 for n in adj[v] if n in alive) >= _KCORE_K


def test_bpe_merge_step_hand_model(spark, tmp_path):
    """BPE single-round semantics pinned by hand: corpus 'aa aa ab'
    (words: aa x2, ab x1) -> pair counts aa:2, ab:1 -> best 'aa';
    applying merges each 'aa' word once (greedy non-overlap)."""
    import pandas as pd

    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["aa aa", "ab aaa"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [5, 6],
        }
    ).to_parquet(p)
    row = queries()["text_bpe_merge_step"](spark, str(tmp_path)).collect()[0]
    # words: aa x2, ab x1, aaa x1. overlapping pair counts:
    #   aa: 2 (from 'aa') + 2 (two overlapping in 'aaa') = 4; ab: 1
    assert row["best_pair"] == "aa"
    assert row["pair_count"] == 4
    assert row["n_distinct_words_with_pair"] == 2
    # greedy merges: 'aa'->1 each (x2 words), 'aaa'->1 (left-to-right), ab 0
    assert row["merges_applied"] == 3
    assert row["symbols_before"] == 2 * 2 + 2 + 3
    assert row["symbols_after"] == row["symbols_before"] - row["merges_applied"]


def test_sax_motifs_hand_model(spark, tmp_path):
    """SAX semantics pinned by hand: one day whose hourly values equal the
    hour index -> PAA segment means (2.5, 8.5, 14.5, 20.5), day mean 11.5,
    sample std sqrt(60) -> z = (-1.162, -0.387, 0.387, 1.162) -> 'abcd'."""
    import datetime as dt

    import pandas as pd

    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    base = dt.datetime(2024, 1, 1)
    rows = [
        {
            "event_id": h,
            "ts": base + dt.timedelta(hours=h),
            "user_id": 1,
            "event_type": "ramp",
            "value": float(h),
            "props": "{}",
        }
        for h in range(24)
    ]
    # a flat day -> zero variance -> all z forced to 0.0 -> 'bbbb'... wait:
    # zq = 0.0 maps to 'c' (0 < 0 false, 0 < 0.6745 true). Pin that too.
    rows += [
        {
            "event_id": 100 + h,
            "ts": base + dt.timedelta(days=1, hours=h),
            "user_id": 1,
            "event_type": "ramp",
            "value": 5.0,
            "props": "{}",
        }
        for h in range(24)
    ]
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["event_type"], r["sax_word"]): r["n_days"]
        for r in queries()["ts_sax_motifs"](spark, str(tmp_path)).collect()
    }
    assert got == {("ramp", "abcd"): 1, ("ramp", "cccc"): 1}, got


def test_winnow_shared_spans_hand_model(spark, tmp_path):
    """Two docs sharing an 11+-char substring MUST produce >= 1 shared
    fingerprint (winnowing guarantee, k=8 w=4); unrelated docs share
    none. The registered query's n_shared>=3 gate is exercised with a
    long shared paragraph."""
    import pandas as pd

    from electricity_forecast_pipeline_airflow_k8s_spark.operators.text import (
        winnow_posts,
    )
    from pyspark.sql import functions as F

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, f"intro one {shared} outro alpha"),
            (2, f"different start {shared} and a different end"),
            (3, "zz qq completely unrelated content xx yy ww vv uu tt ss"),
        ],
        "doc_id long, text string",
    )
    posts = winnow_posts(docs)
    pairs = {
        (r["a"], r["b"]): r["n"]
        for r in posts.alias("x")
        .join(posts.alias("y"), "fp")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert pairs.get((1, 2), 0) >= 3  # long shared span -> many shared fps
    assert (1, 3) not in pairs
    assert (2, 3) not in pairs
