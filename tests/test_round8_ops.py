"""Round-8 pins: the ADVICE-r7 latent-divergence fixes.

1. PQ subspace bounds for embedding lengths not divisible by M (the
   floor-vs-ceil bound bug that silently corrupted ADC tables for d%4!=0).
2. Tie-safe latest-window pick at the ML edge (duplicate (group, ts)
   rows must not make ml_forecast_next_lag1 diverge from the oracle).
3. Raw-ratio jaccard thresholds (filter before rounding, both minhash
   queries).
"""

from __future__ import annotations

import pytest
import os
import datetime as dt

import duckdb

from electricity_forecast_pipeline_airflow_k8s_spark.parity import _normalize
from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.pq import (
    _PQ_M,
    _pq_adc_tables,
    _pq_q9i_int,
    _pq_sub_bounds,
)

BASE = dt.datetime(2024, 1, 1)


def test_pq_sub_bounds_partition_matches_assignment():
    """For every length (divisible by M or not), the per-subspace dim
    ranges must be exactly {i : floor(i*M/d) == s} -- the assignment rule
    the corpus codes and both oracles use."""
    for d in (4, 5, 6, 7, 8, 9, 13, 63, 64):
        seen = []
        for s in range(_PQ_M):
            lo, hi = _pq_sub_bounds(d, s)
            dims = list(range(lo, hi))
            assert dims == [i for i in range(d) if i * _PQ_M // d == s], (d, s)
            seen += dims
        assert seen == list(range(d)), d  # tiles [0, d) exactly


def test_pq_adc_tables_brute_force_d6():
    """d=6 (d%4 != 0): every ADC table entry must equal the brute-force
    sum of per-dim quantized squared diffs over the ASSIGNMENT's dim set.
    With floor bounds, sub0 would sum 1 dim instead of 2 and sub1 the
    wrong dim entirely."""
    cents = {c: [((c * 7 + i * 13) % 23) * 0.5 for i in range(6)] for c in range(3)}
    queries_ = {0: [1.0, 2.0, 0.5, 3.5, 4.0, 0.25]}
    tables = _pq_adc_tables(queries_, cents, sorted(cents))
    for s in range(_PQ_M):
        dims = [i for i in range(6) if i * _PQ_M // 6 == s]
        for ci, c in enumerate(sorted(cents)):
            want = sum(_pq_q9i_int(queries_[0][i], cents[c][i]) for i in dims)
            assert tables[0][s][ci] == want, (s, c)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~7 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_pq_adc_recall_oracle_parity_d6(tmp_path, spark):
    """End-to-end engine-vs-oracle parity for sim_pq_adc_recall on d=6
    embeddings, where per-vector subspace codes genuinely differ across
    subspaces -- the configuration the floor-bound bug corrupted."""
    import pandas as pd

    vecs = [
        {
            "vec_id": j,
            "embedding": [float((j * 7 + i * 13) % 23) * 0.5 for i in range(6)],
            "label": j % 3,
        }
        for j in range(30)
    ]
    pd.DataFrame(vecs).to_parquet(str(tmp_path / "embeddings.parquet"))

    q = registry()["sim_pq_adc_recall"]
    sdf = q.build(spark, str(tmp_path))
    sc, sr = _normalize(list(sdf.columns), [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'"
        )
        cur = con.execute(q.oracle)
        dc, dr = _normalize(
            [d[0] for d in cur.description], [tuple(r) for r in cur.fetchall()]
        )
    finally:
        con.close()
    assert sc == dc and sr == dr, (sr[:3], dr[:3])


def _write_events(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_forecast_lag1_tie_safe_duplicate_ts(tmp_path, spark):
    """Duplicate (event_type, ts) pairs with DISTINCT values around the
    latest-train-window position: without the (window_start, event_id)
    tiebreak the pick is nondeterministic and can diverge from the
    oracle's rn = n_tr - 1 row. Every ts is duplicated here, so an
    untiebroken pick has a 50% chance per group of choosing the wrong x."""
    rows = []
    eid = 0
    for g in ("a", "b"):
        for k in range(5):  # 5 distinct ts, each duplicated -> n=10
            ts = BASE + dt.timedelta(hours=k)
            for dup in range(2):
                # values all distinct so a wrong pick changes the output
                rows.append((eid, ts, 1, g, float(eid * 3 + 7), "{}"))
                eid += 1
    sf = _write_events(tmp_path, rows)

    q = registry()["ml_forecast_next_lag1"]
    sdf = q.build(spark, sf)
    sc, sr = _normalize(list(sdf.columns), [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        cur = con.execute(q.oracle)
        dc, dr = _normalize(
            [d[0] for d in cur.description], [tuple(r) for r in cur.fetchall()]
        )
    finally:
        con.close()
    assert sc == dc and sr == dr, (sr, dr)


def test_minhash_threshold_is_raw_ratio(tmp_path, spark):
    """A pair whose raw jaccard rounds UP to the threshold but sits below
    it raw must be excluded (the oracle filters raw). 3-shingle overlap:
    docs share 9999 of 20003 distinct shingles... impractical -- instead
    pin the boundary with a pair at exactly 0.5 (included) and one just
    below (excluded), using small shingle sets."""
    import pandas as pd

    # doc pairs built from token streams: shingle sets are 3-gram joins.
    # docs 1,2: tokens overlap so |∩|/|∪| == 1/2 exactly (included).
    # docs 3,4: |∩|/|∪| == 2/5 = 0.4 < 0.5 (excluded).
    d1 = "a b c d e f"  # shingles: abc bcd cde def (4)
    d2 = "a b c d x y"  # shingles: abc bcd cdx dxy -> ∩ = {abc,bcd} = 2, ∪ = 6
    # |∩|/|∪| = 2/6 = 0.333 -- adjust: want 0.5: share 4 of 8
    d1 = "a b c d e f g h"  # 6 shingles
    d2 = "a b c d e f x y"  # shingles abc..def (4 shared) + efx fxy -> ∪ = 8, ∩ = 4
    pd.DataFrame(
        [
            (1, d1, "en", "web", len(d1)),
            (2, d2, "en", "web", len(d2)),
            (3, "p q r s", "en", "web", 7),
            (4, "p q r z", "en", "web", 7),
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"))
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in queries()["dedup_minhash_lsh_pairs"](spark, str(tmp_path)).collect()
    }
    # (1,2) raw jaccard = 4/8 = 0.5 -> included at exactly the threshold;
    # (3,4) = 1/3 < 0.5 -> excluded even if LSH banded them together
    assert got.get((1, 2)) == 0.5, got
    assert (3, 4) not in got, got


def _write_docs(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_inc_cc_merges_old_components_hand_model(tmp_path, spark):
    """Two OLD components A={1,2} (text X) and B={3,4} (text Y), an
    untouched component C={5,6}, and a batch chain 9~X, 9~19, 19~Y
    (adjacent jaccard 0.556 -- token windows sliding by 2; the 'w1x'
    token seed is chosen so every chain pair survives LSH banding
    deterministically). The incremental merge must union A, the chain,
    and B into component 1 -- two old labels merging THROUGH new nodes,
    the hardest contracted-graph case -- while C passes through
    untouched. Expected output pinned against scratch CC by hand."""
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    toks = [f"w1x{i}" for i in range(30)]
    x_text = " ".join(toks[0:9])
    n9 = " ".join(toks[2:11])
    n19 = " ".join(toks[4:13])
    y_text = " ".join(toks[6:15])
    w_text = " ".join(toks[20:29])
    sf = _write_docs(
        tmp_path,
        [
            (i, t, "en", "web", len(t))
            for i, t in [
                (1, x_text), (2, x_text), (3, y_text), (4, y_text),
                (5, w_text), (6, w_text), (9, n9), (19, n19),
            ]
        ],
    )
    got = sorted(
        (r["node"], r["component"])
        for r in queries()["inc_cc_new_edges"](spark, sf).collect()
    )
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5), (9, 1), (19, 1)
    ], got


def test_inc_cc_equals_scratch_clusters(spark, sf_dir):
    """On the real fixtures, the incremental contracted-merge labeling
    must be EXACTLY the scratch connected-components labeling over the
    full near-dup pair set (the operator-level incremental == full
    statement, against the independently registered full pipeline)."""
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    full = {
        r["node"]: r["component"]
        for r in queries()["dedup_clusters"](spark, sf_dir).collect()
    }
    inc = {
        r["node"]: r["component"]
        for r in queries()["inc_cc_new_edges"](spark, sf_dir).collect()
    }
    assert inc == full, (len(inc), len(full))


def test_inc_quantile_merge_cut_invariant(tmp_path, spark):
    """Moving the state/batch cut must not change the merged quantiles:
    the histogram merge is associative, so ANY batching of the same rows
    yields the same cumulative and the same grid quantiles -- only the
    n_old/n_new bookkeeping moves. Pins the incremental contract without
    trusting the oracle."""
    import electricity_forecast_pipeline_airflow_k8s_spark.querydefs.incremental as r8

    rows = []
    for k in range(200):
        rows.append(
            (k, BASE + dt.timedelta(hours=k), 1, "ab"[k % 2], float(k % 37) / 3, "{}")
        )
    sf = _write_events(tmp_path, rows)
    q = registry()["inc_quantile_merge"]
    base_rows = {r["event_type"]: tuple(r) for r in q.build(spark, sf).collect()}

    orig = r8._QCUT
    try:
        r8._QCUT = "2024-01-03 07:00:00"
        moved = {r["event_type"]: tuple(r) for r in q.build(spark, sf).collect()}
    finally:
        r8._QCUT = orig
    assert set(moved) == set(base_rows)
    for g, row in base_rows.items():
        # (event_type, n_old, n_new, n_rows, q25, median, q90, q99)
        assert moved[g][3:] == row[3:], (g, row, moved[g])
        assert moved[g][1] != row[1]  # the split genuinely moved


def test_inc_topk_merge_hand_model_and_split_invariance(tmp_path, spark):
    """Batch doc 19 (n_chars 90) must displace the old #3 of source 'w'
    while source 'x' (untouched by the batch) passes through; and
    re-batching with a different modulus residue must yield the identical
    merged top-k (top-k merge is split-invariant)."""
    import electricity_forecast_pipeline_airflow_k8s_spark.querydefs.incremental as r8

    docs = [
        # source w: old docs 1..4 with n_chars 100, 80, 70, 60
        (1, "t", "en", "w", 100),
        (2, "t", "en", "w", 80),
        (3, "t", "en", "w", 70),
        (4, "t", "en", "w", 60),
        # batch doc 19 lands between 80 and 70
        (19, "t", "en", "w", 90),
        # source x: batch-free
        (5, "t", "en", "x", 50),
        (6, "t", "en", "x", 40),
    ]
    sf = _write_docs(tmp_path, [(i, t, l, s, n) for i, t, l, s, n in docs])
    q = registry()["inc_topk_merge"]
    got = [
        (r["source"], r["rnk"], r["doc_id"], r["n_chars"])
        for r in q.build(spark, sf).collect()
    ]
    assert got == [
        ("w", 1, 1, 100),
        ("w", 2, 19, 90),
        ("w", 3, 2, 80),
        ("x", 1, 5, 50),
        ("x", 2, 6, 40),
    ], got

    orig = r8._BATCH_REM
    try:
        r8._BATCH_REM = 3  # different batching of the same corpus
        rebatched = [
            (r["source"], r["rnk"], r["doc_id"], r["n_chars"])
            for r in q.build(spark, sf).collect()
        ]
    finally:
        r8._BATCH_REM = orig
    assert rebatched == got


def test_containment_hand_model(tmp_path, spark):
    """Doc 2 (tokens 5..12 of doc 1) is FULLY contained in doc 1:
    containment(2 in 1) = 1.0 while the reverse ratio 6/18 stays far
    below threshold -- the asymmetric duplicate jaccard misses. Doc 3
    shares nothing. Doc 4 is a 4-token slice (2 shingles < the 5-shingle
    floor) and must be excluded even at containment 1.0."""
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    toks = [f"c{i}" for i in range(20)]
    big = " ".join(toks)            # 18 shingles
    inner = " ".join(toks[5:13])    # 6 shingles, all inside big
    tiny = " ".join(toks[2:6])      # 2 shingles, inside big
    other = "x0 x1 x2 x3 x4 x5"
    sf = _write_docs(
        tmp_path,
        [
            (1, big, "en", "web", len(big)),
            (2, inner, "en", "web", len(inner)),
            (3, other, "en", "web", len(other)),
            (4, tiny, "en", "web", len(tiny)),
        ],
    )
    got = {
        (r["inner_doc"], r["outer_doc"]): r["containment"]
        for r in queries()["dedup_containment_pairs"](spark, sf).collect()
    }
    assert got == {(2, 1): 1.0}, got


def test_containment_stop_shingle_cap(tmp_path, spark):
    """With the DF cap forced to 2, a shingle shared by 3 docs is
    boilerplate and leaves the shingle space: doc 2's containment in
    doc 1 is then computed over its remaining shingles only. Spark-side
    semantics pin (the registered oracle keeps the production cap)."""
    import electricity_forecast_pipeline_airflow_k8s_spark.querydefs.textops2 as r8
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    toks = [f"d{i}" for i in range(12)]
    boiler = "b0 b1 b2"  # one shingle, present in 3 docs -> df 3
    big = " ".join(toks) + " " + boiler
    # capped shingle space of inner: 8 d-shingles shared with big + 2
    # boundary shingles not in big (the b0b1b2 shingle leaves via the
    # cap) -> containment exactly 8/10 = 0.8, at the threshold
    inner = " ".join(toks[0:10]) + " " + boiler
    third = "z0 z1 z2 z3 " + boiler
    sf = _write_docs(
        tmp_path,
        [
            (1, big, "en", "web", len(big)),
            (2, inner, "en", "web", len(inner)),
            (3, third, "en", "web", len(third)),
        ],
    )
    orig = r8._CONT_DF_CAP
    try:
        r8._CONT_DF_CAP = 2
        got = {
            (r["inner_doc"], r["outer_doc"]): r["containment"]
            for r in queries()["dedup_containment_pairs"](spark, sf).collect()
        }
    finally:
        r8._CONT_DF_CAP = orig
    # the pure b0-b1-b2 shingle is df-3 boilerplate and must not create a
    # (3, x) pair; doc 2 still contains in doc 1 via its d-token shingles
    assert all(p[0] != 3 and p[1] != 3 for p in got), got
    assert any(p == (2, 1) for p in got), got


def test_stream_topk_matches_batch_inc_topk(tmp_path, spark):
    """The streaming state fold and the batch merge implement the SAME
    mergeable-top-k contract: on an arbitrary fixture their outputs must
    be identical (and equal scratch top-k by each one's oracle)."""
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    docs = [
        (i, "t", "en", ["w", "x", "y"][i % 3], (i * 37) % 100) for i in range(40)
    ]
    sf = _write_docs(tmp_path, docs)
    batch = [tuple(r) for r in queries()["inc_topk_merge"](spark, sf).collect()]
    streamed = [tuple(r) for r in queries()["stream_topk_merge"](spark, sf).collect()]
    assert streamed == batch, (streamed, batch)


def test_scd2_intervals_hand_model(tmp_path, spark):
    """User 1: A A B A -> three versions with correct spans, n_events,
    and exactly one open (is_current) interval; user 2: constant -> one
    open interval."""
    rows = [
        (1, BASE + dt.timedelta(hours=0), 1, "A", 1.0, "{}"),
        (2, BASE + dt.timedelta(hours=1), 1, "A", 1.0, "{}"),
        (3, BASE + dt.timedelta(hours=2), 1, "B", 1.0, "{}"),
        (4, BASE + dt.timedelta(hours=3), 1, "A", 1.0, "{}"),
        (5, BASE, 2, "C", 1.0, "{}"),
        (6, BASE + dt.timedelta(hours=5), 2, "C", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    got = [
        (r["user_id"], r["version"], r["attr_value"], r["valid_from"],
         r["valid_to"], r["n_events"], r["is_current"])
        for r in queries()["rel_scd2_intervals"](spark, sf).collect()
    ]
    h = lambda k: BASE + dt.timedelta(hours=k)  # noqa: E731
    assert got == [
        (1, 1, "A", h(0), h(2), 2, False),
        (1, 2, "B", h(2), h(3), 1, False),
        (1, 3, "A", h(3), None, 1, True),
        (2, 1, "C", h(0), None, 2, True),
    ], got
