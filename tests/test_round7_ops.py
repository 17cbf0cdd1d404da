"""Hand-model pins for the round-7 operators: tiny synthetic inputs with
independently hand-computed answers (oracle parity is engine-vs-engine;
these pin the SEMANTICS -- especially the incremental==full contracts)."""

from __future__ import annotations

import pytest

import os

import datetime as dt

from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

BASE = dt.datetime(2024, 1, 1)


def _write_events(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_inc_minhash_batch_restriction(tmp_path, spark):
    """Four identical docs: 1, 2 are corpus ('old'), 9, 19 are the batch
    (doc_id % 10 == 9). Incremental dedup must emit every batch-touching
    pair -- but NEVER the old-old pair (1,2), which a full-corpus rerun
    would re-find and re-pay for."""
    text = "alpha beta gamma delta epsilon"
    sf = _write_docs(
        tmp_path,
        [
            (1, text, "en", "web", len(text)),
            (2, text, "en", "web", len(text)),
            (9, text, "en", "web", len(text)),
            (19, text, "en", "web", len(text)),
            (3, "completely different words here entirely", "en", "web", 40),
        ],
    )
    rows = queries()["inc_minhash_new_batch"](spark, sf).collect()
    got = {(r["doc_a"], r["doc_b"]): (r["jaccard"], r["pair_kind"]) for r in rows}
    assert got == {
        (1, 9): (1.0, "new-old"),
        (1, 19): (1.0, "new-old"),
        (2, 9): (1.0, "new-old"),
        (2, 19): (1.0, "new-old"),
        (9, 19): (1.0, "new-new"),
    }, got


def test_inc_sessionize_boundary_merge(tmp_path, spark):
    """user 1 spans the cut with a 4 h gap (< 8 h timeout) -> the two
    boundary sessions are ONE session after the merge; user 2 spans it
    with 36 h -> no merge; user 3 lives entirely in the old half."""
    cut = dt.datetime(2024, 1, 20)
    rows = [
        (1, cut - dt.timedelta(hours=2), 1, "view", 1.0, "{}"),
        (2, cut + dt.timedelta(hours=2), 1, "view", 1.0, "{}"),
        (3, cut - dt.timedelta(hours=36), 2, "view", 1.0, "{}"),
        (4, cut + dt.timedelta(hours=12), 2, "view", 1.0, "{}"),
        (5, BASE, 3, "view", 1.0, "{}"),
        (6, BASE + dt.timedelta(hours=1), 3, "view", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    r = queries()["inc_sessionize_rollforward"](spark, sf).collect()[0]
    assert r["n_users"] == 3
    assert r["n_sessions_old"] == 3  # u1, u2, u3
    assert r["n_sessions_new"] == 2  # u1, u2
    assert r["n_boundary_merges"] == 1  # u1 only
    assert r["n_sessions"] == 4
    assert r["avg_session_events"] == 1.5  # 6 events / 4 sessions


def test_label_propagation_hand_model(tmp_path, spark):
    """Triangle {1,2,3} (each pair co-occurs in 2 hours) + pendant 4 on
    node 3 (1 shared hour), and a disconnected triangle {10,11,12}.
    Two weighted-majority rounds with min-label tie-break converge the
    first component onto label 1 and the second onto label 10."""
    rows = []
    i = 0
    for h in (0, 1):  # triangle 1-2-3, sh=2 per edge
        for u in (1, 2, 3):
            rows.append((i, BASE.replace(hour=h), u, "error", 1.0, "{}"))
            i += 1
    for u in (3, 4):  # pendant edge 3-4, sh=1
        rows.append((i, BASE.replace(hour=2), u, "error", 1.0, "{}"))
        i += 1
    for h in (3, 4):  # triangle 10-11-12, sh=2 per edge
        for u in (10, 11, 12):
            rows.append((i, BASE.replace(hour=h), u, "error", 1.0, "{}"))
            i += 1
    sf = _write_events(tmp_path, rows)
    got = {
        r["community"]: (r["n_members"], r["min_node"])
        for r in queries()["graph_label_propagation"](spark, sf).collect()
    }
    assert got == {1: (4, 1), 10: (3, 10)}, got


def test_pq_assign_hand_model(tmp_path, spark):
    """Init codebook = constant vectors c_j = [j]*8 (vec_id 0..15); test
    vectors [3.4]*8 and [3.5]*8 both snap to centroid 3 (the 3.5 case by
    the cid tie-break against centroid 4). k-means training (round 8)
    then moves centroid 3 to avg(3, 3.4, 3.5) = 3.3 per dim while every
    singleton self-cluster stays put; the final assignment gives
    (subspace, 3) n=3 with mean distortion
    (2*(0.3^2) + 2*(0.1^2) + 2*(0.2^2)) / 3 = 0.28/3 = 0.093333 and every
    other centroid a zero-distortion self-assignment."""
    import pandas as pd

    vecs = [
        {"vec_id": j, "embedding": [float(j)] * 8, "label": 0} for j in range(16)
    ]
    vecs.append({"vec_id": 100, "embedding": [3.4] * 8, "label": 0})
    vecs.append({"vec_id": 101, "embedding": [3.5] * 8, "label": 0})
    pd.DataFrame(vecs).to_parquet(str(tmp_path / "embeddings.parquet"))
    rows = queries()["emb_pq_assign"](spark, str(tmp_path)).collect()
    got = {
        (r["subspace"], r["centroid_id"]): (r["n_assigned"], r["mean_distortion"])
        for r in rows
    }
    for s in range(4):
        assert got[(s, 3)] == (3, 0.093333), got[(s, 3)]
        for j in range(16):
            if j != 3:
                assert got[(s, j)] == (1, 0.0), (s, j, got[(s, j)])
    # every vector assigned in every subspace: 18 per subspace
    for s in range(4):
        assert sum(n for (ss, _), (n, _) in got.items() if ss == s) == 18


def test_scene_change_short_docs_single_scene(tmp_path, spark):
    """Docs shorter than the frame stride yield exactly one sampled frame
    -> no lag pair -> exactly one scene, so the histogram is a single
    (1, n, 1.0) row."""
    sf = _write_docs(
        tmp_path,
        [(i, "short doc %d" % i, "en", "web", 12) for i in range(3)],
    )
    rows = queries()["mm_scene_change"](spark, sf).collect()
    assert [(r["n_scenes"], r["n_media"], r["pct_media"]) for r in rows] == [
        (1, 3, 1.0)
    ]


def test_scene_change_partitions_media(tmp_path, spark):
    """Histogram covers every media exactly once and pct sums to 1."""
    sf = _write_docs(
        tmp_path,
        [(i, "word " * (i * 150 + 5), "en", "web", 0) for i in range(8)],
    )
    rows = queries()["mm_scene_change"](spark, sf).collect()
    assert sum(r["n_media"] for r in rows) == 8
    assert abs(sum(r["pct_media"] for r in rows) - 1.0) < 1e-3


def test_ndcg_perfect_ranking_is_one(tmp_path, spark):
    """Equal-length docs with monotone tf: single-term BM25 is monotone in
    tf at fixed dl, so the score ranking equals the relevance-ideal
    ranking and nDCG@10 == 1.0 for every probe term present."""
    sf = _write_docs(
        tmp_path,
        [
            (1, "spark spark spark pad1 pad2", "en", "web", 0),
            (2, "spark spark pad1 pad2 pad3", "en", "web", 0),
            (3, "spark pad1 pad2 pad3 pad4", "en", "web", 0),
            (4, "join join join pad1 pad2", "en", "web", 0),
            (5, "nothing relevant here at all", "en", "web", 0),
        ],
    )
    got = {
        r["term"]: (r["n_rel_docs"], r["ndcg_at_10"])
        for r in queries()["text_ndcg_eval"](spark, sf).collect()
    }
    assert got["spark"] == (3, 1.0), got
    assert got["join"] == (1, 1.0), got
    assert "fast" not in got  # no candidate docs -> no row


def test_zonemap_sorted_layout_prunes_to_one_file(tmp_path, spark):
    """o_custkey == o_orderkey and o_orderdate cycling mod 7: the
    custkey-sorted layout has contiguous disjoint zones (every probe hits
    exactly 1 of the 64 files) while the date-cycled layout interleaves
    custkeys so nearly every file straddles every probe."""
    import datetime as dt

    import pandas as pd

    n = 6400
    base = dt.datetime(2024, 1, 1)
    df = pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_custkey": range(n),
            "o_orderdate": [base + dt.timedelta(days=i % 7) for i in range(n)],
        }
    )
    # micros precision: Spark's parquet reader rejects pandas' default
    # nanosecond timestamps for non-events tables
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    df.to_parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["layout"]: (r["avg_files_scanned"], r["scan_pct"])
        for r in queries()["layout_zonemap_pruning"](spark, str(tmp_path)).collect()
    }
    assert got["custkey_sorted"][0] == 1.0, got
    # 7 date-stripes x stride-7 custkey interleave -> each probe lands in
    # one ~stride-stripe per date group: an order of magnitude worse than
    # the sorted layout (measured 11.4 files/probe)
    assert got["time_sorted"][0] > 5 * got["custkey_sorted"][0], got


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~5 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_pq_adc_recall_exact_when_corpus_is_codebook(tmp_path, spark):
    """When every corpus vector IS a centroid, PQ codes have zero
    quantization error, so the ADC ranking equals the exact ranking and
    recall@10 is 1.0 for every probe query."""
    import pandas as pd

    vecs = [
        {"vec_id": j, "embedding": [float(j)] * 8, "label": 0} for j in range(16)
    ]
    pd.DataFrame(vecs).to_parquet(str(tmp_path / "embeddings.parquet"))
    rows = queries()["sim_pq_adc_recall"](spark, str(tmp_path)).collect()
    assert len(rows) == 10
    assert all(r["recall_at_10"] == 1.0 and r["n_matched"] == 10 for r in rows), rows


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~5 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_ivfpq_recall_exact_when_single_cluster_codebook(tmp_path, spark):
    """All 16 codebook vectors in ONE cluster: the probe trivially selects
    it, the candidate set is the whole corpus, and zero-quantization-error
    ADC equals exact L2 -> recall@5 is 1.0 for every query with 15
    candidates each."""
    import pandas as pd

    vecs = [
        {"vec_id": j, "embedding": [float(j)] * 8, "label": 0} for j in range(16)
    ]
    pd.DataFrame(vecs).to_parquet(str(tmp_path / "embeddings.parquet"))
    rows = queries()["sim_ivfpq_recall"](spark, str(tmp_path)).collect()
    assert len(rows) == 10
    assert all(
        r["recall_at_5"] == 1.0 and r["n_matched"] == 5 and r["n_candidates"] == 15
        for r in rows
    ), rows


def test_inc_minhash_equals_full_pipeline_restricted(spark, sf_dir):
    """On the real fixtures, the incremental batch-probe result must be
    EXACTLY the full-corpus LSH dedup result restricted to batch-touching
    pairs -- same candidates, same verified Jaccards (the operator-level
    statement of incremental == full, against the independently
    registered full pipeline rather than the SQL oracle)."""
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in queries()["dedup_minhash_lsh_pairs"](spark, sf_dir).collect()
    }
    expected = {
        pair: j
        for pair, j in full.items()
        if pair[0] % 10 == 9 or pair[1] % 10 == 9
    }
    inc = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in queries()["inc_minhash_new_batch"](spark, sf_dir).collect()
    }
    assert inc == expected, (len(inc), len(expected))
