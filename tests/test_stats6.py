"""Hand-model / reference-implementation tests for the survival,
long-memory, forecast-eval, lift, and Ljung-Box operators (stats6).

Each test writes a tiny parquet fixture dir, runs the registered query on
it, and compares against an independent pure-Python computation (or a
hand-computed model), so correctness is pinned without the DuckDB oracle.
"""

from __future__ import annotations

import os
import datetime as dt
import math

import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).coalesce(1).write.parquet(f"{path}/orders.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{path}/events.parquet")


def _km_reference(subjects):
    """Pure-Python product-limit estimator.

    subjects: list of (t, event_flag). Returns {t: survival} at event times.
    """
    n = len(subjects)
    from collections import defaultdict

    d = defaultdict(int)
    removed = defaultdict(int)
    for t, ev in subjects:
        removed[t] += 1
        if ev:
            d[t] += 1
    s = 1.0
    at_risk = n
    out = {}
    for t in sorted(removed):
        if d[t]:
            s *= 1.0 - d[t] / at_risk
            out[t] = s
        at_risk -= removed[t]
    return out


def test_km_repurchase_matches_reference(spark, tmp_path):
    # 3 customers; global max date comes from customer 3's last order
    base = dt.datetime(2020, 1, 1)
    orders = [
        # cust 1: days 0, 1, 3 -> gaps 1, 2; censored tail 10 - 3 = 7
        (1, 1, base),
        (2, 1, base + dt.timedelta(days=1)),
        (3, 1, base + dt.timedelta(days=3)),
        # cust 2: days 2, 4 -> gap 2; censored tail 6
        (4, 2, base + dt.timedelta(days=2)),
        (5, 2, base + dt.timedelta(days=4)),
        # cust 3: day 10 only -> censored tail 0
        (6, 3, base + dt.timedelta(days=10)),
    ]
    _write_orders(spark, str(tmp_path), orders)
    rows = registry()["rel_km_repurchase"].build(spark, str(tmp_path)).collect()

    subjects = [(1, 1), (2, 1), (7, 0), (2, 1), (6, 0), (0, 0)]
    ref = _km_reference(subjects)
    got = {r["t_days"]: r["survival"] for r in rows}
    assert set(got) == set(ref)
    for t, s in ref.items():
        assert got[t] == pytest.approx(s, abs=1e-4), t
    # survival must be non-increasing and n_risk strictly decreasing
    ordered = sorted(rows, key=lambda r: r["t_days"])
    for a, b in zip(ordered, ordered[1:]):
        assert b["survival"] <= a["survival"] + 1e-12
        assert b["n_risk"] < a["n_risk"]


def _rs_reference(xs, w):
    """Mean log2(R/S) over full chunks of size w (population std)."""
    n_chunks = len(xs) // w
    vals = []
    for c in range(n_chunks):
        chunk = xs[c * w : (c + 1) * w]
        m = sum(chunk) / w
        cum = 0.0
        devs = []
        for x in chunk:
            cum += x - m
            devs.append(cum)
        r = max(devs) - min(devs)
        s = math.sqrt(sum((x - m) ** 2 for x in chunk) / w)
        if s > 0:
            vals.append(math.log2(r / s))
    return (sum(vals) / len(vals), len(vals)) if vals else (None, 0)


def test_hurst_rs_matches_reference(spark, tmp_path):
    # 64 dense hours with a deterministic irregular count pattern
    base = dt.datetime(2020, 1, 1)
    counts = [((7 * h) % 5) + ((h * h) % 3) + 1 for h in range(64)]
    rows, eid = [], 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=5), 1, "a", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["window_hours"]: r
        for r in registry()["ts_hurst_rs"].build(spark, str(tmp_path)).collect()
    }
    # sizes 16 and 32 and 64 fit; 128 has no full chunk
    assert set(got) == {16, 32, 64}
    ys = {}
    for w in (16, 32, 64):
        ref, n_chunks = _rs_reference(counts, w)
        assert got[w]["n_chunks"] == n_chunks
        assert got[w]["mean_log2_rs"] == pytest.approx(ref, abs=1e-4)
        ys[w] = ref
    # slope of the 3-point fit
    pts = [(math.log2(w), ys[w]) for w in ys]
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    for r in got.values():
        assert r["hurst_exponent"] == pytest.approx(slope, abs=1e-3)


def test_pinball_loss_hand_model(spark, tmp_path):
    # 10 days x 1 hour-of-day; train = first 8 days with hv = 1..8, so
    # q-quantiles (linear interpolation over sorted 1..8) are
    # f_q = 1 + 7q; test days have hv = 10 and 0.
    base = dt.datetime(2020, 1, 1)
    rows = []
    for d in range(8):
        rows.append((d, base + dt.timedelta(days=d), 1, "a", float(d + 1), "{}"))
    rows.append((8, base + dt.timedelta(days=8), 1, "a", 10.0, "{}"))
    rows.append((9, base + dt.timedelta(days=9), 1, "a", 0.0, "{}"))
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["quantile"]: r
        for r in registry()["ts_pinball_loss"].build(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0.1, 0.5, 0.9}
    for q in (0.1, 0.5, 0.9):
        f = 1 + 7 * q
        terms = [max(q * (y - f), (q - 1) * (y - f)) for y in (10.0, 0.0)]
        assert got[q]["n_test_hours"] == 2
        assert got[q]["pinball_loss"] == pytest.approx(
            sum(terms) / 2, abs=1e-4
        ), q


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~5 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_decile_lift_hand_model(spark, tmp_path):
    # 20 customers, balances 20..1; buyers = the 4 highest-balance
    # customers plus the 2 lowest. Base rate = 6/20.
    cust = [(i, float(21 - i)) for i in range(1, 21)]
    spark.createDataFrame(cust, "c_custkey long, c_acctbal double").coalesce(
        1
    ).write.parquet(f"{tmp_path}/customer.parquet")
    buyers = [1, 2, 3, 4, 19, 20]
    orders = [
        (i, c, dt.datetime(2020, 1, 1) + dt.timedelta(days=i))
        for i, c in enumerate(buyers)
    ]
    _write_orders(spark, str(tmp_path), orders)
    rows = registry()["rel_decile_lift"].build(spark, str(tmp_path)).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    by_d = {r["decile"]: r for r in rows}
    # deciles of 2: decile 1 = custkeys 1,2 (buyers), decile 2 = 3,4 ...
    assert by_d[1]["n_buyers"] == 2 and by_d[2]["n_buyers"] == 2
    assert by_d[10]["n_buyers"] == 2
    assert sum(r["n_buyers"] for r in rows) == 6
    base_rate = 6 / 20
    # cumulative lift at decile 2: 4 buyers in 4 customers -> 1/base
    assert by_d[2]["cum_lift"] == pytest.approx(1.0 / base_rate, abs=1e-4)
    # final decile returns lift to exactly 1
    assert by_d[10]["cum_lift"] == pytest.approx(1.0, abs=1e-4)


def test_ljung_box_periodic_series(spark, tmp_path):
    # alternating hourly counts 1, 9, 1, 9, ... over 48 hours: rho_1 -> -1,
    # rho_2 -> +1 (up to the 1/n mean-offset bias), and Q blows up far past
    # any white-noise critical value.
    base = dt.datetime(2020, 1, 1)
    rows, eid = [], 0
    for h in range(48):
        c = 9 if h % 2 else 1
        for _ in range(c):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=1), 1, "a", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["lag"]: r
        for r in registry()["ts_ljung_box"].build(spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert got[1]["rho"] < -0.9
    assert got[2]["rho"] > 0.9
    assert got[6]["q_ljung_box"] > 100  # chi2(6) 99.9% crit ~ 22.5
    # Q is cumulative, so it must be non-decreasing in lag
    qs = [got[k]["q_ljung_box"] for k in sorted(got)]
    assert qs == sorted(qs)
    # cross-check rho_1 against the exact autocovariance-ratio definition
    xs = [9 if h % 2 else 1 for h in range(48)]
    n = len(xs)
    m = sum(xs) / n
    c0 = sum((x - m) ** 2 for x in xs)
    c1 = sum((xs[t] - m) * (xs[t - 1] - m) for t in range(1, n))
    assert got[1]["rho"] == pytest.approx(c1 / c0, abs=1e-4)


def test_bitmap_overlap_matches_set_reference(spark, tmp_path):
    # users straddle several 32-bit words, including exact boundaries
    base = dt.datetime(2020, 1, 1)
    aud = {
        "a": {0, 1, 31, 32, 33, 64, 100},
        "b": {1, 31, 33, 63, 64, 200},
        "c": {5000},  # overlaps nobody -> must not appear in any pair
    }
    rows, eid = [], 0
    for t, users in aud.items():
        for u in users:
            rows.append((eid, base + dt.timedelta(minutes=eid), u, t, 1.0, "{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in registry()["rel_bitmap_overlap"].build(spark, str(tmp_path)).collect()
    }
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    inter = aud["a"] & aud["b"]
    union = aud["a"] | aud["b"]
    assert r["n_a"] == len(aud["a"]) and r["n_b"] == len(aud["b"])
    assert r["n_overlap"] == len(inter)
    assert r["jaccard"] == pytest.approx(len(inter) / len(union), abs=1e-4)


def test_granger_detects_planted_causality(spark, tmp_path):
    # purchases copy the previous hour's clicks (plus tiny parity noise):
    # click->purchase must dominate the reverse direction, and the RSS
    # values must match a numpy least-squares reference.
    import numpy as np

    base = dt.datetime(2020, 1, 1)
    clicks = [((5 * h) % 7) + 1 for h in range(40)]
    purch = [3] + [clicks[h - 1] + (h % 2) for h in range(1, 40)]
    rows, eid = [], 0
    for h in range(40):
        for _ in range(clicks[h]):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=1), 1, "click", 1.0, "{}")
            )
            eid += 1
        for _ in range(purch[h]):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=2), 1, "purchase", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["direction"]: r
        for r in registry()["ts_granger_lag1"].build(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"click->purchase", "purchase->click"}
    fwd, rev = got["click->purchase"], got["purchase->click"]
    assert fwd["n_obs"] == 39 and rev["n_obs"] == 39

    def rss(y, X):
        beta, res, *_ = np.linalg.lstsq(X, y, rcond=None)
        r = y - X @ beta
        return float(r @ r)

    y = np.array(purch[1:], dtype=float)
    ylag = np.array(purch[:-1], dtype=float)
    xlag = np.array(clicks[:-1], dtype=float)
    ones = np.ones_like(y)
    rss_r = rss(y, np.column_stack([ones, ylag]))
    rss_u = rss(y, np.column_stack([ones, ylag, xlag]))
    assert fwd["rss_restricted"] == pytest.approx(rss_r, rel=1e-3)
    assert fwd["rss_unrestricted"] == pytest.approx(rss_u, rel=1e-3)
    assert fwd["f_stat"] == pytest.approx(
        (rss_r - rss_u) / (rss_u / (39 - 3)), rel=1e-3
    )
    assert fwd["f_stat"] > 10 * max(rev["f_stat"], 1.0)


def test_spectral_flatness_detects_12h_cycle(spark, tmp_path):
    # hourly values follow a pure 2-cycles-per-day cosine (12 h period)
    # plus a small deterministic ripple: dominant_k must be 2 and the
    # spectrum must be far from flat.
    base = dt.datetime(2020, 1, 1)
    rows = []
    for h in range(96):
        v = 100.0 + 40.0 * math.cos(2 * math.pi * 2 * (h % 24) / 24) + (h % 3)
        rows.append((h, base + dt.timedelta(hours=h, minutes=30), 1, "a", v, "{}"))
    _write_events(spark, str(tmp_path), rows)
    [r] = registry()["ts_spectral_flatness"].build(spark, str(tmp_path)).collect()
    assert r["n_harmonics"] == 11
    assert r["dominant_k"] == 2
    assert r["dominant_share"] > 0.95
    assert r["spectral_flatness"] < 0.1


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~4 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_cramers_v_perfect_and_independent(spark, tmp_path):
    base = dt.datetime(2020, 1, 1)
    # perfect association: type 'a' only cohort 0 (users 0, 8, 16),
    # type 'b' only cohort 1 (users 1, 9, 17) -> V = 1
    rows = []
    eid = 0
    for u in (0, 8, 16):
        rows.append((eid, base + dt.timedelta(minutes=eid), u, "a", 1.0, "{}"))
        eid += 1
    for u in (1, 9, 17):
        rows.append((eid, base + dt.timedelta(minutes=eid), u, "b", 1.0, "{}"))
        eid += 1
    _write_events(spark, str(tmp_path), rows)
    [r] = registry()["val_cramers_v"].build(spark, str(tmp_path)).collect()
    assert (r["r_levels"], r["c_levels"]) == (2, 2)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-4)

    # independence: both types hit both cohorts in identical proportions
    indep = str(tmp_path / "indep")
    rows2 = []
    eid = 0
    for t in ("a", "b"):
        for u in (0, 1):
            for _ in range(5):
                rows2.append(
                    (eid, base + dt.timedelta(minutes=eid), u, t, 1.0, "{}")
                )
                eid += 1
    _write_events(spark, indep, rows2)
    [r2] = registry()["val_cramers_v"].build(spark, indep).collect()
    assert r2["chi2"] == pytest.approx(0.0, abs=1e-4)
    assert r2["cramers_v"] == pytest.approx(0.0, abs=1e-4)


def test_price_volume_mix_hand_model(spark, tmp_path):
    # one brand: 1998 sells 10 units at unit price 2 (rev 20); 1999 sells
    # 20 units at unit price 3 (rev 60). dRev = 40 decomposes into
    # volume (10 * 2 = 20), price (1 * 10 = 10), cross (1 * 10 = 10).
    spark.createDataFrame(
        [(1, "Brand#X")], "p_partkey long, p_brand string"
    ).coalesce(1).write.parquet(f"{tmp_path}/part.parquet")
    li = [
        (1, dt.datetime(1998, 6, 1), 10.0, 20.0, 0.0),
        (1, dt.datetime(1999, 6, 1), 20.0, 60.0, 0.0),
    ]
    spark.createDataFrame(
        li,
        "l_partkey long, l_shipdate timestamp, l_quantity double,"
        " l_extendedprice double, l_discount double",
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    [r] = registry()["rel_price_volume_mix"].build(spark, str(tmp_path)).collect()
    assert r["rev_1998"] == 20.0 and r["rev_1999"] == 60.0
    assert r["volume_effect"] == pytest.approx(20.0, abs=1e-2)
    assert r["price_effect"] == pytest.approx(10.0, abs=1e-2)
    assert r["cross_effect"] == pytest.approx(10.0, abs=1e-2)
    total = r["volume_effect"] + r["price_effect"] + r["cross_effect"]
    assert total == pytest.approx(r["rev_1999"] - r["rev_1998"], abs=1e-2)


def test_next_pred_accuracy_hand_model(spark, tmp_path):
    # one user; span 10 hours, cut at 80% -> source events in hours 0-7
    # are train. Sequence alternates a,b except the tail flips.
    base = dt.datetime(2020, 1, 1)
    types = ["a", "b", "a", "b", "a", "b", "a", "b", "a", "a", "b"]
    rows = [
        (i, base + dt.timedelta(hours=i), 1, t, 1.0, "{}")
        for i, t in enumerate(types)
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["event_type"]: r
        for r in registry()["sess_next_pred_accuracy"]
        .build(spark, str(tmp_path))
        .collect()
    }
    # span = 10h, cut = hour 8: transitions sourced at hours 0..7 train,
    # 8..9 test. Train: a->b x4, b->a x4. Test: a->a (wrong), a->b (right).
    assert got["a"]["predicted_next"] == "b"
    assert got["a"]["n_train"] == 4 and got["a"]["n_test"] == 2
    assert got["a"]["n_correct"] == 1
    assert got["a"]["accuracy"] == pytest.approx(0.5, abs=1e-4)
    assert "b" not in got  # b has no test transitions (n_test = 0 filtered)


def _waterfill_reference(avail, weights, budget_mult=2, cap_mult=3, rounds=3):
    b = budget_mult * sum(avail.values())
    tw = sum(weights.values())
    alloc = {s: min(b * weights[s] // tw, cap_mult * avail[s]) for s in avail}
    capped = {s: b * weights[s] // tw >= cap_mult * avail[s] for s in avail}
    for _ in range(rounds - 1):
        rem = b - sum(alloc.values())
        wl = sum(weights[s] for s in avail if not capped[s])
        if wl <= 0:
            break
        for s in avail:
            if capped[s]:
                continue
            add = rem * weights[s] // wl
            new = min(alloc[s] + add, cap_mult * avail[s])
            if alloc[s] + add >= cap_mult * avail[s]:
                capped[s] = True
            alloc[s] = new
    return alloc


def test_token_budget_plan_waterfill(spark, tmp_path):
    # src4 (weight 5) is tiny -> caps at 3 epochs; its surplus flows to
    # the others. Token counts are exact word counts.
    docs = [
        (0, "w " * 100, "en", "src0", 200),   # 100 tokens, weight 1
        (1, "w " * 80, "en", "src1", 160),    # 80 tokens,  weight 2
        (2, "w " * 60, "en", "src2", 120),    # 60 tokens,  weight 3
        (3, "w " * 40, "en", "src3", 80),     # 40 tokens,  weight 4
        (4, "w " * 10, "en", "src4", 20),     # 10 tokens,  weight 5 -> caps
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["source"]: r
        for r in registry()["sample_token_budget_plan"]
        .build(spark, str(tmp_path))
        .collect()
    }
    avail = {"src0": 100, "src1": 80, "src2": 60, "src3": 40, "src4": 10}
    weights = {"src0": 1, "src1": 2, "src2": 3, "src3": 4, "src4": 5}
    ref = _waterfill_reference(avail, weights)
    for s in avail:
        assert rows[s]["tokens_available"] == avail[s]
        assert rows[s]["weight"] == weights[s]
        assert rows[s]["allocated_tokens"] == ref[s], s
        assert rows[s]["epochs"] <= 3.0 + 1e-9
    # the capped source really is pinned at its cap
    assert rows["src4"]["allocated_tokens"] == 30
    # nothing over-allocated
    assert sum(r["allocated_tokens"] for r in rows.values()) <= 2 * sum(
        avail.values()
    )


def test_kmeans_step_matches_numpy(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(7)
    # two well-separated blobs, labels deliberately half-wrong so the
    # update step has real movement
    pts = np.vstack(
        [rng.normal(0, 0.1, (10, 4)), rng.normal(5, 0.1, (10, 4))]
    ).astype(np.float32)
    labels = [0] * 8 + [1] * 2 + [1] * 8 + [0] * 2
    rows = [
        (i, [float(x) for x in pts[i]], int(labels[i])) for i in range(20)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")
    got = {
        r["label"]: r
        for r in registry()["emb_kmeans_step"].build(spark, str(tmp_path)).collect()
    }
    p = pts.astype(np.float64)
    cents = {
        c: p[[i for i in range(20) if labels[i] == c]].mean(axis=0)
        for c in (0, 1)
    }
    assign = {}
    for i in range(20):
        d = {c: float(((p[i] - cents[c]) ** 2).sum()) for c in (0, 1)}
        assign[i] = min((0, 1), key=lambda c: (d[c], c))
    for c in (0, 1):
        members = [i for i in range(20) if assign[i] == c]
        assert got[c]["n_assigned"] == len(members)
        newc = p[members].mean(axis=0)
        shift = float(np.sqrt(((newc - cents[c]) ** 2).sum()))
        assert got[c]["centroid_shift"] == pytest.approx(shift, abs=1e-5)
        inertia = sum(float(((p[i] - cents[c]) ** 2).sum()) for i in members)
        assert got[c]["inertia"] == pytest.approx(inertia, abs=1e-3)


def test_lifecycle_states_hand_model(spark, tmp_path):
    # week numbering is epoch_day // 7; use explicit epoch-aligned weeks.
    # user 1: weeks 0,1,3 -> new@0, retained@1, churned@2, resurrected@3
    # user 2: week 1 only -> new@1, churned@2
    # user 3: weeks 3 -> new@3
    def at_week(w):
        return dt.datetime(1970, 1, 1) + dt.timedelta(days=7 * w, hours=12)

    rows = []
    eid = 0
    for u, weeks in ((1, (0, 1, 3)), (2, (1,)), (3, (3,))):
        for w in weeks:
            rows.append((eid, at_week(w), u, "view", 1.0, "{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["week"]: r
        for r in registry()["sess_lifecycle_states"].build(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert (got[0]["n_new"], got[0]["n_retained"], got[0]["n_resurrected"], got[0]["n_churned"]) == (1, 0, 0, 0)
    assert (got[1]["n_new"], got[1]["n_retained"], got[1]["n_churned"]) == (1, 1, 0)
    assert (got[2]["n_new"], got[2]["n_retained"], got[2]["n_churned"]) == (0, 0, 2)
    assert (got[3]["n_new"], got[3]["n_resurrected"], got[3]["n_churned"]) == (1, 1, 0)
    # quick ratio: week 2 has 0 incoming, 2 churned -> 0.0; week 3 null-churn
    assert got[2]["quick_ratio"] == pytest.approx(0.0, abs=1e-4)
    assert got[3]["quick_ratio"] is None


def test_modularity_sums_and_perfect_partition(spark, tmp_path):
    # two users bouncing strictly within their own stage: view<->click and
    # signup<->purchase. All weight is within-community -> Q = sum of
    # terms = 1 - sum((d_c/2m)^2) and every internal_weight = edge total.
    base = dt.datetime(2020, 1, 1)
    rows = []
    eid = 0
    for u, (x, y) in ((1, ("view", "click")), (2, ("signup", "purchase"))):
        for i in range(5):
            rows.append((eid, base + dt.timedelta(minutes=eid), u, x if i % 2 == 0 else y, 1.0, "{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["community"]: r
        for r in registry()["graph_modularity"].build(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"browse", "convert"}
    # 4 transitions per user, all internal; degrees 8 each, 2m = 16
    for c in ("browse", "convert"):
        assert got[c]["internal_weight"] == 4
        assert got[c]["degree_weight"] == 8
        assert got[c]["modularity_term"] == pytest.approx(
            4 / 8 - (8 / 16) ** 2, abs=1e-4
        )
    q = sum(r["modularity_term"] for r in got.values())
    assert q == pytest.approx(0.5, abs=1e-3)


def test_langid_confusion_hand_model(spark, tmp_path):
    docs = [
        (0, "the cat sat on the mat and it is happy", "en", "src0", 40),  # tp en
        (1, "el perro es un animal que vive en la casa", "en", "src0", 41),  # pred es, actual en
        (2, "xyzzy qwerty", "zh", "src0", 12),  # no stopword hits -> und
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["lang_class"]: r
        for r in registry()["text_langid_confusion"].build(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"en", "es", "zh", "und"}
    en = got["en"]
    assert (en["support"], en["n_predicted"], en["tp"]) == (2, 1, 1)
    assert en["precision_"] == pytest.approx(1.0, abs=1e-4)
    assert en["recall_"] == pytest.approx(0.5, abs=1e-4)
    assert en["f1"] == pytest.approx(2 / 3, abs=1e-4)
    es = got["es"]
    assert (es["support"], es["n_predicted"], es["tp"]) == (0, 1, 0)
    assert es["precision_"] == pytest.approx(0.0, abs=1e-4)
    assert es["recall_"] is None and es["f1"] is None
    zh = got["zh"]
    assert (zh["support"], zh["n_predicted"], zh["tp"]) == (1, 0, 0)
    assert zh["precision_"] is None and zh["recall_"] == pytest.approx(0.0, abs=1e-4)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_hyp = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~11 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=300), min_size=2, max_size=6
    ),
    data=st.data(),
)
@_hyp
def test_token_budget_plan_properties(spark, tmp_path_factory, counts, data):
    """Waterfill invariants for arbitrary source sizes: Spark == the pure
    reference; nothing over cap; total never exceeds the budget; a capped
    source is pinned exactly at 3x its tokens."""
    tmp_path = tmp_path_factory.mktemp("wf")
    docs = [
        (i, "w " * c, "en", f"src{i}", 2 * c) for i, c in enumerate(counts)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["source"]: r
        for r in registry()["sample_token_budget_plan"]
        .build(spark, str(tmp_path))
        .collect()
    }
    avail = {f"src{i}": c for i, c in enumerate(counts)}
    weights = {s: (int(s[3:]) % 5) + 1 for s in avail}
    ref = _waterfill_reference(avail, weights)
    budget = 2 * sum(avail.values())
    total_alloc = 0
    for s in avail:
        got = rows[s]["allocated_tokens"]
        assert got == ref[s], (s, counts)
        assert got <= 3 * avail[s]
        total_alloc += got
    assert total_alloc <= budget


def test_join_cardinality_equals_actual_join(spark, sf_dir):
    """The histogram estimate is EXACT for equi-joins: est_rows must equal
    the actually-executed join count for every edge."""
    rows = {
        r["join_edge"]: r
        for r in registry()["val_join_cardinality"].build(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pa = spark.read.parquet(f"{sf_dir}/part.parquet")
    actual = {
        "lineitem x orders ON orderkey": li.join(
            o, li.l_orderkey == o.o_orderkey
        ).count(),
        "orders x customer ON custkey": o.join(
            cu, o.o_custkey == cu.c_custkey
        ).count(),
        "lineitem x part ON partkey": li.join(
            pa, li.l_partkey == pa.p_partkey
        ).count(),
    }
    for edge, n in actual.items():
        assert rows[edge]["est_rows"] == n, edge


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~5 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_key_skew_report_uniform_vs_skewed(spark, tmp_path):
    # planted skew: one user holds half the events; a uniform orders
    # custkey distribution must report near-max entropy and ratio 1
    base = dt.datetime(2020, 1, 1)
    rows = []
    eid = 0
    for _ in range(50):
        rows.append((eid, base + dt.timedelta(minutes=eid), 7, "view", 1.0, "{}"))
        eid += 1
    for u in range(50):
        rows.append((eid, base + dt.timedelta(minutes=eid), 100 + u, "view", 1.0, "{}"))
        eid += 1
    _write_events(spark, str(tmp_path), rows)
    orders = [(i, i % 10, base + dt.timedelta(days=i)) for i in range(100)]
    _write_orders(spark, str(tmp_path), orders)
    # lineitem: uniform 2 rows per orderkey
    spark.createDataFrame(
        [(i // 2, float(i)) for i in range(200)], "l_orderkey long, l_dummy double"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["key_col"]: r
        for r in registry()["val_key_skew_report"].build(spark, str(tmp_path)).collect()
    }
    ev = got["events.user_id"]
    assert ev["n_rows"] == 100 and ev["n_keys"] == 51
    assert ev["max_freq"] == 50 and ev["top1_share"] == pytest.approx(0.5, abs=1e-4)
    # skewed entropy far below log2(51); the p99/median ratio blows up
    assert ev["key_entropy_bits"] < 4.0
    assert ev["p99_over_median"] > 10
    oc = got["orders.o_custkey"]
    assert oc["n_keys"] == 10 and oc["max_freq"] == 10
    assert oc["key_entropy_bits"] == pytest.approx(math.log2(10), abs=1e-3)
    assert oc["p99_over_median"] == pytest.approx(1.0, abs=1e-4)


def test_median_of_means_robust_to_contamination(spark, tmp_path):
    # 320 clean values of 10.0 plus one 1e6 outlier: the plain mean moves
    # by ~3000, the median of means stays at 10 (the outlier poisons only
    # its own bucket).
    base = dt.datetime(2020, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "view", 10.0, "{}")
        for i in range(320)
    ]
    rows.append((320, base + dt.timedelta(minutes=320), 1, "view", 1e6, "{}"))
    _write_events(spark, str(tmp_path), rows)
    [r] = registry()["val_median_of_means"].build(spark, str(tmp_path)).collect()
    assert r["n_values"] == 321 and r["k_buckets"] == 32
    assert r["median_of_means"] == pytest.approx(10.0, abs=1e-4)


def test_tokenizer_fertility_hand_model(spark, tmp_path):
    # "abcdefgh ij" -> pieces [abcdefgh, ij] -> ceil(8/4)+ceil(2/4) = 3 bpe
    # tokens over 2 whitespace words -> fertility 1.5; 11 chars / 3 bpe.
    docs = [(0, "abcdefgh ij", "en", "src0", 11)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    [r] = registry()["text_tokenizer_fertility"].build(spark, str(tmp_path)).collect()
    assert (r["ws_tokens"], r["bpe_tokens"], r["n_chars"]) == (2, 3, 11)
    assert r["fertility"] == pytest.approx(1.5, abs=1e-4)
    assert r["chars_per_token"] == pytest.approx(11 / 3, abs=1e-4)


def test_curriculum_order_invariants(spark, sf_dir):
    rows = (
        registry()["sample_curriculum_order"].build(spark, sf_dir).collect()
    )
    n = len(rows)
    # ranks are an exact permutation of 1..n
    assert sorted(r["curriculum_rank"] for r in rows) == list(range(1, n + 1))
    # stages are monotone in rank: every stage-s rank < every stage-(s+1) rank
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r["curriculum_rank"])
    stages = sorted(by_stage)
    for a, b in zip(stages, stages[1:]):
        assert max(by_stage[a]) < min(by_stage[b])
    # shorter stages really contain shorter docs (boundary ties aside,
    # stage max bpe <= next stage min is NOT guaranteed at ties, but
    # stage medians must be non-decreasing)
    import statistics

    medians = [
        statistics.median(
            [r["bpe_tokens"] for r in rows if r["stage"] == s]
        )
        for s in stages
    ]
    assert medians == sorted(medians)


def test_k_anonymity_hand_model(spark, tmp_path):
    # QI groups: (0, A) x 6 members with 2 distinct balance buckets,
    # (0, B) x 2 members with 1 bucket, (1, A) x 12 with 3 buckets.
    rows = []
    ck = 0
    for nation, seg, sizes in ((0, "A", [1000.0] * 3 + [2500.0] * 3),
                               (0, "B", [500.0] * 2),
                               (1, "A", [0.0] * 4 + [1500.0] * 4 + [3200.0] * 4)):
        for bal in sizes:
            rows.append((ck, nation, seg, bal))
            ck += 1
    spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_mktsegment string, c_acctbal double"
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    [r] = registry()["val_k_anonymity"].build(spark, str(tmp_path)).collect()
    assert r["n_rows"] == 20 and r["n_groups"] == 3
    assert r["k_anonymity"] == 2
    assert r["pct_rows_k_lt_5"] == pytest.approx(2 / 20, abs=1e-4)
    assert r["pct_rows_k_lt_10"] == pytest.approx(8 / 20, abs=1e-4)
    assert r["l_diversity_min"] == 1
    assert r["median_group_size"] == pytest.approx(6.0, abs=1e-4)


def test_audio_frame_energy_hand_model(spark, tmp_path):
    # 96 chars -> exactly two full frames: [0..63] and [32..95].
    text = "".join(chr(65 + (i % 26)) for i in range(96))
    docs = [(0, text, "en", "src0", 96)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    [r] = registry()["mm_audio_frame_energy"].build(spark, str(tmp_path)).collect()
    assert r["n_samples"] == 96 and r["n_frames"] == 2

    def rms(lo, hi):
        s2 = sum((ord(text[i]) % 256 - 128) ** 2 for i in range(lo, hi))
        return math.sqrt(s2 / 64) / 128

    r0, r1 = rms(0, 64), rms(32, 96)
    assert r["mean_rms"] == pytest.approx((r0 + r1) / 2, abs=1e-5)
    # peak = argmax s2 with ties to the smaller frame id
    s2_0 = sum((ord(text[i]) % 256 - 128) ** 2 for i in range(0, 64))
    s2_1 = sum((ord(text[i]) % 256 - 128) ** 2 for i in range(32, 96))
    expected_peak = 0 if s2_0 >= s2_1 else 1
    assert r["peak_frame"] == expected_peak
    assert r["peak_rms"] == pytest.approx(max(r0, r1), abs=1e-5)


def test_cdf_normalize_shares_sum_to_one(spark, sf_dir):
    rows = registry()["rel_cdf_normalize"].build(spark, sf_dir).collect()
    assert sum(r["n_orders"] for r in rows) > 0
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=2e-3)
    assert all(0 <= r["bucket"] <= 19 for r in rows)


def test_forecast_ensemble_weights_and_sanity(spark, sf_dir):
    rows = registry()["ts_forecast_ensemble"].build(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r["event_type"], {})[r["model"]] = r
    for t, models in by.items():
        assert set(models) == {"seasonal", "trend", "ensemble"}
        w = models["seasonal"]["weight"] + models["trend"]["weight"]
        assert w == pytest.approx(1.0, abs=2e-4), t
        assert models["ensemble"]["weight"] is None
        # the ensemble can't be catastrophically worse than both bases
        worst = max(models["seasonal"]["mae_test"], models["trend"]["mae_test"])
        assert models["ensemble"]["mae_test"] <= worst * 1.05, t


def test_duplicate_payments_hand_model(spark, tmp_path):
    base = dt.datetime(2020, 1, 1)
    orders = [
        # cust 1: two near-identical totals 5 days apart -> pair (1, 2)
        (1, 1, base, 1000.0),
        (2, 1, base + dt.timedelta(days=5), 1500.0),
        # cust 1: far in time -> excluded
        (3, 1, base + dt.timedelta(days=100), 1000.0),
        # cust 2: price gap too big -> excluded
        (4, 2, base, 1000.0),
        (5, 2, base + dt.timedelta(days=1), 5000.0),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    rows = registry()["val_duplicate_payments"].build(spark, str(tmp_path)).collect()
    assert [(r["orderkey_a"], r["orderkey_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["price_diff"] == 500.0 and rows[0]["days_apart"] == 5


def test_code_detect_hand_model(spark, tmp_path):
    code = "def f(x):\n    y = x * 2;\n    return {x: y};\n" * 5
    prose = "The quiet afternoon passed slowly as the rain fell on the old roof. " * 5
    docs = [
        (0, code, "en", "srcA", len(code)),
        (1, prose, "en", "srcA", len(prose)),
        (2, prose, "en", "srcB", len(prose)),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["source"]: r
        for r in registry()["text_code_detect_stats"].build(spark, str(tmp_path)).collect()
    }
    assert got["srcA"]["n_docs"] == 2 and got["srcA"]["n_code_docs"] == 1
    assert got["srcA"]["code_share"] == pytest.approx(0.5, abs=1e-4)
    assert got["srcB"]["n_code_docs"] == 0


def test_intermittency_classification_hand_model(spark, tmp_path):
    base = dt.datetime(2020, 1, 1)
    # brand S: daily demand of constant 10 for 10 consecutive days ->
    # ADI = 1, CV2 = 0 -> smooth.
    # brand L: two demand days 20 days apart with sizes 1 and 100 ->
    # ADI = 20, CV2 large -> lumpy.
    li, pk = [], []
    pk.append((1, "Brand#S")); pk.append((2, "Brand#L"))
    k = 0
    for d in range(10):
        li.append((1, base + dt.timedelta(days=d), 10.0)); k += 1
    li.append((2, base, 1.0))
    li.append((2, base + dt.timedelta(days=20), 100.0))
    spark.createDataFrame(pk, "p_partkey long, p_brand string").coalesce(1)\
        .write.parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        li, "l_partkey long, l_shipdate timestamp, l_quantity double"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["p_brand"]: r
        for r in registry()["ts_intermittency_stats"].build(spark, str(tmp_path)).collect()
    }
    s, l = got["Brand#S"], got["Brand#L"]
    assert s["adi"] == pytest.approx(1.0, abs=1e-4)
    assert s["cv2"] == pytest.approx(0.0, abs=1e-4)
    assert s["demand_class"] == "smooth"
    assert l["adi"] == pytest.approx(20.0, abs=1e-4)
    mean = 50.5
    var = ((1 - mean) ** 2 + (100 - mean) ** 2) / 2
    assert l["cv2"] == pytest.approx(var / mean**2, abs=1e-3)
    assert l["demand_class"] == "lumpy"


def test_boilerplate_share_hand_model(spark, tmp_path):
    footer = "(c) 2020 Example Corp - all rights reserved"
    docs = []
    for i in range(6):
        docs.append((i, f"unique body {i}\n{footer}", "en", "srcA", 50))
    docs.append((6, "no footer here\njust text", "en", "srcB", 24))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["source"]: r
        for r in registry()["text_boilerplate_share"].build(spark, str(tmp_path)).collect()
    }
    a = got["srcA"]
    assert a["n_lines"] == 12 and a["n_boiler_lines"] == 6
    assert a["boiler_share"] == pytest.approx(0.5, abs=1e-4)
    assert a["worst_line_doc_count"] == 6
    assert got["srcB"]["n_boiler_lines"] == 0


def test_negative_sampling_dist_hand_model(spark, tmp_path):
    docs = [(0, "a a a a b b c", "en", "src0", 13)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    rows = registry()["text_negative_sampling_dist"].build(spark, str(tmp_path)).collect()
    got = {r["token"]: r for r in rows}
    assert [r["token"] for r in rows] == ["a", "b", "c"]
    w = {t: c**0.75 for t, c in (("a", 4), ("b", 2), ("c", 1))}
    z = sum(w.values())
    for t in w:
        assert got[t]["p_neg"] == pytest.approx(w[t] / z, abs=1e-5), t
    assert sum(r["p_neg"] for r in rows) == pytest.approx(1.0, abs=3e-6)


def test_discount_elasticity_recovers_planted_exponent(spark, tmp_path):
    # mean qty per discount level follows qty = 100 * (1-d)^(-2) exactly
    # -> log-log slope = -2.
    base = dt.datetime(2020, 1, 1)
    li = []
    k = 0
    for pct in (0, 5, 10, 20):
        q = 100.0 * (1 - pct / 100.0) ** -2
        for _ in range(3):
            li.append((k, base, q, pct / 100.0))
            k += 1
    spark.createDataFrame(
        li, "l_orderkey long, l_shipdate timestamp, l_quantity double, l_discount double"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    rows = registry()["rel_discount_elasticity"].build(spark, str(tmp_path)).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["elasticity"] == pytest.approx(-2.0, abs=1e-3)
