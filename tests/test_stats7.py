"""Hand-model tests for the stats7 batch: max drawdown, variance ratio,
PACF (Durbin-Levinson), and the later planning/governance operators.

Each test writes a tiny parquet fixture dir, runs the registered query,
and compares against an independent pure-Python computation, so
correctness is pinned without the DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt
import math

from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{path}/events.parquet")


def _hourly_rows(values, etype="load", start=None):
    start = start or dt.datetime(2021, 3, 1)
    return [
        (i, start + dt.timedelta(hours=i), 1, etype, float(v), "{}")
        for i, v in enumerate(values)
    ]


def test_max_drawdown_hand_model(spark, tmp_path):
    # level series with a known worst decline: peak 10 -> trough 4
    vals = [5.0, 10.0, 7.0, 4.0, 9.0, 12.0, 11.0]
    _write_events(spark, str(tmp_path), _hourly_rows(vals))
    row = (
        registry()["ts_max_drawdown"].build(spark, str(tmp_path)).collect()[0]
    )
    assert row.n_hours == 7
    assert row.peak_value == 12.0
    assert row.max_drawdown == 6.0  # 10 - 4
    assert abs(row.max_drawdown_pct - 0.6) < 1e-9  # 6 / 10


def test_max_drawdown_monotonic_series_is_zero(spark, tmp_path):
    _write_events(spark, str(tmp_path), _hourly_rows([1.0, 2.0, 3.0, 4.0]))
    row = (
        registry()["ts_max_drawdown"].build(spark, str(tmp_path)).collect()[0]
    )
    assert row.max_drawdown == 0.0
    assert row.max_drawdown_pct == 0.0


def _dense_counts(rows):
    """Zero-filled hourly count series for the single event type."""
    hours = [int(r[1].timestamp() // 3600) for r in rows]
    h0, h1 = min(hours), max(hours)
    xs = [0] * (h1 - h0 + 1)
    for h in hours:
        xs[h - h0] += 1
    return xs


def test_variance_ratio_matches_reference(spark, tmp_path):
    # multiple events in some hours, gaps in others -> nontrivial counts
    base = dt.datetime(2021, 3, 1)
    rows = []
    eid = 0
    pattern = [3, 0, 1, 4, 0, 0, 2, 5, 1, 0, 3, 2, 4, 0, 1, 6]
    for i, n in enumerate(pattern):
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=i), 1, "load", 1.0, "{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    xs = _dense_counts(rows)
    assert xs == pattern

    def popvar(ds):
        m = sum(ds) / len(ds)
        return sum((d - m) ** 2 for d in ds) / len(ds)

    d1 = [xs[i] - xs[i - 1] for i in range(1, len(xs))]
    dq = [xs[i] - xs[i - 4] for i in range(4, len(xs))]
    expect = popvar(dq) / (4.0 * popvar(d1))
    row = (
        registry()["ts_variance_ratio"].build(spark, str(tmp_path)).collect()[0]
    )
    assert row.n_diffs_1 == len(d1)
    assert row.n_diffs_q == len(dq)
    assert abs(row.variance_ratio - expect) < 2e-4


def _pacf_reference(xs, kmax=3):
    """Durbin-Levinson from full-series-mean autocovariances."""
    n = len(xs)
    m = sum(xs) / n
    c0 = sum((x - m) ** 2 for x in xs)
    r = {}
    for k in range(1, kmax + 1):
        r[k] = sum((xs[i] - m) * (xs[i - k] - m) for i in range(k, n)) / c0
    phi11 = r[1]
    phi22 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
    phi21 = r[1] * (1 - phi22)
    phi33 = (r[3] - phi21 * r[2] - phi22 * r[1]) / (
        1 - phi21 * r[1] - phi22 * r[2]
    )
    return {1: phi11, 2: phi22, 3: phi33}


def test_pacf_matches_reference(spark, tmp_path):
    base = dt.datetime(2021, 3, 1)
    rows = []
    eid = 0
    pattern = [2, 5, 3, 6, 1, 4, 7, 2, 5, 3, 8, 1, 4, 6, 2, 7, 3, 5]
    for i, n in enumerate(pattern):
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=i), 1, "load", 1.0, "{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    expect = _pacf_reference(pattern)
    got = {
        r.lag: r.pacf
        for r in registry()["ts_pacf"].build(spark, str(tmp_path)).collect()
    }
    for k in (1, 2, 3):
        assert abs(got[k] - expect[k]) < 2e-4, (k, got[k], expect[k])


def test_pacf_lag1_equals_acf_lag1(spark, tmp_path):
    # phi_11 is rho_1 by construction; sanity-pin the recursion base case
    base = dt.datetime(2021, 3, 1)
    rows = []
    eid = 0
    for i, n in enumerate([1, 3, 2, 4, 1, 5, 2, 3]):
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=i), 1, "load", 1.0, "{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    xs = [1, 3, 2, 4, 1, 5, 2, 3]
    n = len(xs)
    m = sum(xs) / n
    c0 = sum((x - m) ** 2 for x in xs)
    r1 = sum((xs[i] - m) * (xs[i - 1] - m) for i in range(1, n)) / c0
    got = {
        r.lag: r.pacf
        for r in registry()["ts_pacf"].build(spark, str(tmp_path)).collect()
    }
    assert abs(got[1] - r1) < 2e-4


def _write_alloc_tables(spark, path, orders, customers, nations):
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        customers, "c_custkey long, c_nationkey long"
    ).coalesce(1).write.parquet(f"{path}/customer.parquet")
    spark.createDataFrame(
        nations, "n_nationkey long, n_name string"
    ).coalesce(1).write.parquet(f"{path}/nation.parquet")


def test_largest_remainder_allocation_sums_to_budget(spark, tmp_path):
    # revenue 37 / 21 / 42 -> quotas 370 / 210 / 420, exact floors, no
    # leftover; then a fractional case below
    orders = [(1, 1, 37.0), (2, 2, 21.0), (3, 3, 42.0)]
    customers = [(1, 10), (2, 20), (3, 30)]
    nations = [(10, "A"), (20, "B"), (30, "C")]
    _write_alloc_tables(spark, str(tmp_path), orders, customers, nations)
    rows = (
        registry()["rel_largest_remainder_alloc"]
        .build(spark, str(tmp_path))
        .collect()
    )
    assert sum(r.seats for r in rows) == 1000
    assert {r.n_name: r.seats for r in rows} == {"A": 370, "B": 210, "C": 420}


def test_largest_remainder_fractional_case(spark, tmp_path):
    # revenue 1/1/1 -> quota 333.33.. each; floors sum to 999, the
    # leftover unit goes to the smallest nation key (remainders tie)
    orders = [(1, 1, 1.0), (2, 2, 1.0), (3, 3, 1.0)]
    customers = [(1, 10), (2, 20), (3, 30)]
    nations = [(10, "A"), (20, "B"), (30, "C")]
    _write_alloc_tables(spark, str(tmp_path), orders, customers, nations)
    rows = (
        registry()["rel_largest_remainder_alloc"]
        .build(spark, str(tmp_path))
        .collect()
    )
    assert sum(r.seats for r in rows) == 1000
    seats = {r.n_name: r.seats for r in rows}
    assert seats == {"A": 334, "B": 333, "C": 333}


def test_degree_powerlaw_alpha_reference(spark, tmp_path):
    # customers with degrees 1, 2, 4: alpha = 1 + n / sum(ln(2d))
    orders = [(i, c, 1.0) for i, c in enumerate([1, 2, 3])]
    li = []
    # orderkey 0 -> cust 1 (1 part), 1 -> cust 2 (2 parts), 2 -> cust 3 (4)
    parts = {0: [100], 1: [100, 200], 2: [100, 200, 300, 400]}
    ln = 0
    for ok, ps in parts.items():
        for p in ps:
            li.append((ok, p, ln))
            ln += 1
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_linenumber long"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    rows = (
        registry()["graph_degree_powerlaw"].build(spark, str(tmp_path)).collect()
    )
    degrees = [1, 2, 4]
    expect_alpha = 1 + len(degrees) / sum(math.log(2 * d) for d in degrees)
    assert all(abs(r.alpha_mle - expect_alpha) < 2e-4 for r in rows)
    # buckets: floor(log2(d)) = 0, 1, 2 with one customer each
    assert {r.deg_bucket: r.n_custs for r in rows} == {0: 1, 1: 1, 2: 1}


def test_t_closeness_uniform_groups_emd_zero(spark, tmp_path):
    # every group has the same balance distribution as the global one
    rows = []
    ck = 1
    for nat in (1, 2):
        for seg in ("A", "B"):
            for bal in (500.0, 1500.0, 2500.0):
                rows.append((ck, f"c{ck}", nat, bal, seg))
                ck += 1
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    out = registry()["val_t_closeness"].build(spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert all(r.emd == 0.0 for r in out)


def test_t_closeness_divergent_group(spark, tmp_path):
    # group (1, A) holds only bucket 0; group (2, B) only bucket 2 ->
    # EMD = sum|cumP-cumQ|/(m-1) with cumQ = (1/2, 1/2, 1) -> 0.5 each
    rows = [
        (1, "a", 1, 100.0, "A"),
        (2, "b", 1, 150.0, "A"),
        (3, "c", 2, 2100.0, "B"),
        (4, "d", 2, 2200.0, "B"),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    out = {
        (r.c_nationkey, r.c_mktsegment): r.emd
        for r in registry()["val_t_closeness"].build(spark, str(tmp_path)).collect()
    }
    # buckets: 0 and 2 -> m = 2, denominator m-1 = 1
    # group (1,A): cumP = (1, 1); cumQ = (0.5, 1) -> EMD = 0.5
    assert abs(out[(1, "A")] - 0.5) < 1e-9
    assert abs(out[(2, "B")] - 0.5) < 1e-9


def test_compaction_plan_covers_all_files_and_bytes(spark, tmp_path):
    base = dt.datetime(1995, 1, 1)
    rows = []
    ok = 1
    counts = [3, 1, 4, 2, 5, 1, 2, 3, 4, 1]
    for i, n in enumerate(counts):
        for _ in range(n):
            rows.append((ok, 1, "O", 10.0, base + dt.timedelta(days=i), "1-URGENT"))
            ok += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    out = registry()["layout_compaction_plan"].build(spark, str(tmp_path)).collect()
    assert sum(r.n_files for r in out) == len(counts)
    assert sum(r.bytes for r in out) == sum(counts) * 120
    # bins are contiguous date ranges: each bin's first day follows the
    # previous bin's last day
    ordered = sorted(out, key=lambda r: r.bin)
    for a, b in zip(ordered, ordered[1:]):
        assert a.last_day < b.first_day


def test_absorbing_markov_hand_chain(spark, tmp_path):
    # user chain: view -> click -> purchase, repeated; plus a view -> view
    # self-ish loop via a second user. Transition counts are exact.
    base = dt.datetime(2021, 3, 1)
    rows = []
    eid = 0

    def emit(uid, seq):
        nonlocal eid
        for i, et in enumerate(seq):
            rows.append(
                (eid, base + dt.timedelta(minutes=eid), uid, et, 1.0, "{}")
            )
            eid += 1

    emit(1, ["view", "click", "purchase"])
    emit(2, ["view", "click", "purchase"])
    emit(3, ["view", "view", "click"])
    _write_events(spark, str(tmp_path), rows)
    out = {
        r.event_type: r
        for r in registry()["sess_absorbing_markov"]
        .build(spark, str(tmp_path))
        .collect()
    }
    # click -> purchase 2 of 2 times observed (third click is terminal)
    assert out["click"].p_within_1 == 1.0
    # view: transitions view->click (3), view->view (1); no direct purchase
    assert out["view"].p_within_1 == 0.0
    # within 2: view -> click -> purchase: P(view->click) * 1.0 = 0.75
    assert abs(out["view"].p_within_2 - 0.75) < 1e-3
    # within 3 adds view -> view -> click -> ... (click within 2 = 1.0):
    # 0.75 + 0.25 * p2(view)? no -- view->view then p2(view) = 0.75:
    # p3(view) = 0.75 + 0.25 * 0.75 = 0.9375
    assert abs(out["view"].p_within_3 - 0.9375) < 1e-3
    # probabilities are monotone in the horizon for every state
    for r in out.values():
        assert r.p_within_1 <= r.p_within_2 + 1e-9
        assert r.p_within_2 <= r.p_within_3 + 1e-9


def test_oov_rate_hand_model(spark, tmp_path):
    # vocab will be the 256 most frequent tokens; with a tiny corpus all
    # tokens fit -> oov 0; then check with distinct rare tokens per source
    docs = [
        (1, "aa bb aa", "en", "s1", 8),
        (2, "aa bb cc", "en", "s2", 8),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.source: r
        for r in registry()["text_oov_rate"].build(spark, str(tmp_path)).collect()
    }
    assert out["s1"].oov_occurrence_rate == 0.0
    assert out["s2"].oov_occurrence_rate == 0.0
    assert out["s1"].n_occurrences == 3
    assert out["s2"].n_types == 3


def test_croston_hand_model(spark, tmp_path):
    # one brand, demand days 0, 2, 6 (sizes 10, 20, 30), alpha = 0.1:
    #   z_3 = 0.9^2*10 + 0.1*0.9*20 + 0.1*30 = 8.1 + 1.8 + 3 = 12.9
    #   intervals: 2, 4 -> p = 0.9*2 + 0.1*4 = 2.2
    #   forecast = 12.9 / 2.2; sba = * 0.95
    base = dt.datetime(1995, 1, 1)
    li = []
    ln = 0
    for day, qty in [(0, 10.0), (2, 20.0), (6, 30.0)]:
        li.append((ln, 100, ln, qty, base + dt.timedelta(days=day)))
        ln += 1
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_linenumber long,"
        " l_quantity double, l_shipdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(100, "BrandX")], "p_partkey long, p_brand string"
    ).coalesce(1).write.parquet(f"{tmp_path}/part.parquet")
    row = registry()["ts_croston"].build(spark, str(tmp_path)).collect()[0]
    assert row.n_demand_days == 3
    assert abs(row.croston_size - 12.9) < 1e-3
    assert abs(row.croston_interval_days - 2.2) < 1e-3
    assert abs(row.forecast_per_day - 12.9 / 2.2) < 1e-3
    assert abs(row.forecast_sba - 12.9 / 2.2 * 0.95) < 1e-3
