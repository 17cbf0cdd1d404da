"""Hand-model pins for the round-7 operators: tiny synthetic inputs with
independently hand-computed answers (oracle parity is engine-vs-engine;
these pin the SEMANTICS -- especially the incremental==full contracts)."""

from __future__ import annotations

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
    """Codebook = constant vectors c_j = [j]*8 (vec_id 0..15). Every
    centroid self-assigns with zero distortion in all 4 subspaces; test
    vectors [3.4]*8 and [3.5]*8 both snap to centroid 3 (the 3.5 case by
    the cid tie-break against centroid 4), giving (subspace, 3) exactly
    n=3 and mean distortion (0 + 0.32 + 0.5) / 3 = 0.273333."""
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
        assert got[(s, 3)] == (3, 0.273333), got[(s, 3)]
        for j in range(16):
            if j != 3:
                assert got[(s, j)] == (1, 0.0), (s, j, got[(s, j)])
    # every vector assigned in every subspace: 18 per subspace
    for s in range(4):
        assert sum(n for (ss, _), (n, _) in got.items() if ss == s) == 18
