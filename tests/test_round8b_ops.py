"""Hand-model pins for the round-8b operators: tiny synthetic inputs with
independently hand-computed answers (oracle parity is engine-vs-engine;
these pin the SEMANTICS -- the SCD2 merge algebra across the batch
boundary, maximal-span merging, each Gopher rule in isolation, the
no-false-negative bloom contract)."""

from __future__ import annotations

import datetime as dt

from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries


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


def test_scd2_merge_boundary_algebra(tmp_path, spark):
    """Every merge case at once: a batch that RENEWS the current value
    (user 1: version and valid_from keep, count adds), an untouched key
    (user 2: state passes through), a brand-new key (user 3: versions
    start at 1), and a change-then-revert (user 4: the revert opens a
    NEW version, never merges with old version 1)."""
    d = lambda day: dt.datetime(2024, 1, day)  # noqa: E731
    ev = [
        (1, d(10), 1, "A", 1.0, None),
        (2, d(12), 1, "A", 1.0, None),
        (3, d(21), 1, "A", 1.0, None),  # batch: renews current
        (4, d(22), 1, "B", 1.0, None),  # batch: change
        (5, d(5), 2, "X", 1.0, None),  # old only
        (6, d(6), 2, "Y", 1.0, None),
        (7, d(25), 3, "C", 1.0, None),  # batch-only key
        (8, d(26), 3, "C", 1.0, None),
        (9, d(27), 3, "D", 1.0, None),
        (10, d(11), 4, "Q", 1.0, None),
        (11, d(23), 4, "R", 1.0, None),  # batch: change
        (12, d(24), 4, "Q", 1.0, None),  # batch: revert -> NEW version
    ]
    sf = _write_events(tmp_path, ev)
    rows = queries()["rel_scd2_merge"](spark, sf).collect()
    got = {
        (r["user_id"], r["version"]): (
            r["attr_value"],
            r["valid_from"],
            r["valid_to"],
            r["n_events"],
            r["is_current"],
        )
        for r in rows
    }
    assert got == {
        (1, 1): ("A", d(10), d(22), 3, False),
        (1, 2): ("B", d(22), None, 1, True),
        (2, 1): ("X", d(5), d(6), 1, False),
        (2, 2): ("Y", d(6), None, 1, True),
        (3, 1): ("C", d(25), d(27), 2, False),
        (3, 2): ("D", d(27), None, 1, True),
        (4, 1): ("Q", d(11), d(23), 1, False),
        (4, 2): ("R", d(23), d(24), 1, False),
        (4, 3): ("Q", d(24), None, 1, True),
    }, got


def test_scd2_merge_equals_scratch_on_fixture(spark, sf_dir):
    """The incremental contract on real data: the merge path's output is
    row-identical to the scratch full-history build (rel_scd2_intervals),
    whatever the batch split contains."""
    merged = {tuple(r) for r in queries()["rel_scd2_merge"](spark, sf_dir).collect()}
    scratch = {
        tuple(r) for r in queries()["rel_scd2_intervals"](spark, sf_dir).collect()
    }
    assert merged == scratch


def test_span_dedup_maximal_spans(tmp_path, spark):
    """Docs 1 and 2 share the 7-token run 'a b c d e f g' at different
    offsets; its three duplicated 5-gram starts must merge into ONE
    maximal span per doc (start..start+6), and the context grams
    straddling the run boundary must NOT extend it."""
    sf = _write_docs(
        tmp_path,
        [
            (1, "u1 u2 a b c d e f g w1 w2", "en", "web", 25),
            (2, "v1 a b c d e f g z1 z2 z3", "en", "web", 25),
            (3, "completely different tokens here nothing shared at all",
             "en", "web", 54),
        ],
    )
    rows = queries()["text_span_dedup"](spark, sf).collect()
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"], r["n_grams"])
        for r in rows
    }
    assert got == {1: (3, 9, 7, 3), 2: (2, 8, 7, 3)}, got


def test_gopher_rules_isolated(tmp_path, spark):
    """One source per rule, each failing exactly the rule it is built to
    fail (plus a fully passing source)."""
    good = "the and of that " + "alpha beta gamma delta " * 14  # 60 words
    short = "tiny doc the and"  # 4 words: word-count rule only
    nostop = "zulu " * 55  # no stop words
    symbols = "the and " + "xx#x " * 58  # symbol ratio 58/60 > 0.1
    bullets = "\n".join(
        ["-itemone the and gamma"] + ["-itemone alpha beta gamma"] * 19
    )  # 20/20 bullet lines, 80 words
    docs = [
        (1, good, "en", "good", len(good)),
        (2, short, "en", "short", len(short)),
        (3, nostop, "en", "nostop", len(nostop)),
        (4, symbols, "en", "symbols", len(symbols)),
        (5, bullets, "en", "bullets", len(bullets)),
    ]
    sf = _write_docs(tmp_path, docs)
    rows = queries()["text_quality_gopher"](spark, sf).collect()
    by_src = {r["source"]: r.asDict() for r in rows}

    assert by_src["good"]["n_pass"] == 1
    fails = {k: v for k, v in by_src["good"].items() if k.startswith("fail_")}
    assert all(v == 0 for v in fails.values()), fails

    assert by_src["short"]["fail_word_count"] == 1
    assert by_src["short"]["n_pass"] == 0
    assert by_src["short"]["fail_stop_words"] == 0

    assert by_src["nostop"]["fail_stop_words"] == 1
    assert by_src["nostop"]["fail_word_count"] == 0
    assert by_src["nostop"]["n_pass"] == 0

    assert by_src["symbols"]["fail_symbol_ratio"] == 1
    assert by_src["symbols"]["fail_mean_word_len"] == 0
    assert by_src["symbols"]["n_pass"] == 0

    assert by_src["bullets"]["fail_bullet_lines"] == 1
    assert by_src["bullets"]["fail_alpha_words"] == 0
    assert by_src["bullets"]["fail_stop_words"] == 0
    assert by_src["bullets"]["n_pass"] == 0


def test_int8_recall_monotone_grid(tmp_path, spark):
    """12 constant vectors at values 0, 10, ..., 110: affine int8 codes
    are strictly monotone in the value, so the int8 ranking equals the
    exact ranking and recall@10 is exactly 1.0 for all ten probes."""
    import pandas as pd

    vecs = [
        {"vec_id": i, "embedding": [float(i * 10)] * 64, "label": 0}
        for i in range(12)
    ]
    pd.DataFrame(vecs).to_parquet(str(tmp_path / "embeddings.parquet"))
    rows = queries()["sim_int8_recall"](spark, str(tmp_path)).collect()
    assert len(rows) == 10
    for r in rows:
        assert (r["n_matched"], r["recall_at_10"]) == (10, 1.0), r


def test_bloom_never_misses_and_prunes(spark, sf_dir):
    """The structural bloom contract on the real fixture: no false
    negatives (bloom >= truth per probe, false_pos = bloom - truth), the
    zonemap on the time-sorted layout never beats truth either
    (zonemap >= truth), and the bloom prunes strictly better than the
    zonemap in aggregate -- the reason the lane exists."""
    rows = queries()["layout_bloom_pruning"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_files_bloom"] >= r["n_files_truth"], r
        assert r["n_false_pos"] == r["n_files_bloom"] - r["n_files_truth"], r
        assert r["n_files_zonemap"] >= r["n_files_truth"], r
    assert sum(r["n_files_bloom"] for r in rows) < sum(
        r["n_files_zonemap"] for r in rows
    )


def test_kmv_batching_invariance(tmp_path, spark):
    """The mergeable-sketch contract: the KMV state depends only on the
    distinct key SET, never on how the cut slices it -- the same 40 users
    split all-old vs half-new must produce identical sketches and
    estimates."""
    base = dt.datetime(2024, 1, 10)
    late = dt.datetime(2024, 1, 25)

    def events(split: bool):
        rows = []
        for i in range(40):
            ts = late if (split and i % 2) else base
            rows.append((i, ts, 1000 + i, "load", 1.0, None))
        return rows

    a_dir = tmp_path / "a"
    b_dir = tmp_path / "b"
    a_dir.mkdir()
    b_dir.mkdir()
    out = []
    for d, split in ((a_dir, False), (b_dir, True)):
        _write_events(d, events(split))
        rows = queries()["inc_kmv_distinct_merge"](spark, str(d)).collect()
        out.append({r["event_type"]: tuple(r)[1:] for r in rows})
    assert out[0] == out[1], out
    # 40 distinct users > k=16: the sketch is saturated and estimating
    n_exact, n_state, est, rel = out[0]["load"]
    assert (n_exact, n_state) == (40, 16)
    assert est > 0 and rel >= 0


def test_kmv_exact_regime_below_k(tmp_path, spark):
    """With fewer distinct keys than k the sketch IS the key set: the
    estimate equals the exact count and the relative error is zero."""
    rows = [
        (i, dt.datetime(2024, 1, 10 + (i % 20)), 50 + (i % 12), "load", 1.0, None)
        for i in range(30)
    ]
    sf = _write_events(tmp_path, rows)
    out = queries()["inc_kmv_distinct_merge"](spark, sf).collect()
    r = out[0]
    assert r["n_exact"] == 12 and r["n_state"] == 12
    assert r["kmv_estimate"] == 12.0 and r["rel_err"] == 0.0


def test_stream_quantile_hand_grid(tmp_path, spark):
    """Values 1..100 on one group: the drained streamed histogram must
    read off exactly the discrete grid quantiles (25, 50, 90, 99) --
    whatever micro-batch order the engine picked."""
    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 28)), 1, "load", float(i), None)
        for i in range(1, 101)
    ]
    sf = _write_events(tmp_path, rows)
    out = queries()["stream_quantile_merge"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_rows"], r["q25"], r["median"], r["q90"], r["q99"]) == (
        100,
        25.0,
        50.0,
        90.0,
        99.0,
    ), r


def test_ridge_moments_merge_boundary_pair(tmp_path, spark):
    """Old half [1, 2], batch [3, 4]: the merge must fold the boundary
    pair (2 -> 3) that neither half contains internally -- n_pairs = 3
    -- and the closed-form ridge over x=[1,2,3], y=[2,3,4] with alpha=1
    gives slope 26/24 = 1.0833, intercept 15/24 = 0.625 -> 0.63."""
    ev = [
        (1, dt.datetime(2024, 1, 10), 1, "load", 1.0, None),
        (2, dt.datetime(2024, 1, 12), 1, "load", 2.0, None),
        (3, dt.datetime(2024, 1, 21), 1, "load", 3.0, None),
        (4, dt.datetime(2024, 1, 22), 1, "load", 4.0, None),
    ]
    sf = _write_events(tmp_path, ev)
    rows = queries()["inc_ridge_moments_merge"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_pairs"], r["slope"], r["intercept"]) == (3, 1.0833, 0.63), r


def test_snapshot_diff_classification(tmp_path, spark):
    """One key per class: 3 (in B only -> added), 5 (in A only ->
    removed), 2 (value perturbed -> changed), 1 (untouched -> unchanged),
    and 9 (null value perturbed -> null*1.1 is still null -> UNCHANGED,
    the null-safe compare)."""
    mk = lambda i, v: (i, dt.datetime(2024, 1, 10), 1, "load", v, None)  # noqa: E731
    sf = _write_events(tmp_path, [mk(1, 5.0), mk(2, 5.0), mk(3, 5.0), mk(5, 5.0), mk(9, None)])
    rows = queries()["val_snapshot_diff"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"]) == (
        1,
        1,
        1,
        2,
    ), r


def test_span_impact_union_never_double_counts(tmp_path, spark):
    """Doc 1's two duplicated grams start at positions 1 and 3 -- their
    5-token covers [1..5] and [3..7] OVERLAP, so the union coverage is 7
    tokens, never 10: the per-position distinct is what keeps the impact
    number honest when islands overlap in token space."""
    sf = _write_docs(
        tmp_path,
        [
            (1, "a b c d e f g", "en", "s1", 13),
            (2, "a b c d e z1 z2 z3", "en", "s2", 18),
            (3, "c d e f g y1 y2", "en", "s3", 15),
        ],
    )
    rows = queries()["text_span_dedup_impact"](spark, sf).collect()
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["dup_tokens"], r["dup_pct"])
        for r in rows
    }
    assert got == {
        "s1": (1, 7, 7, 1.0),
        "s2": (1, 8, 5, 0.625),
        "s3": (1, 7, 5, 0.7143),
    }, got


def test_ppr_hand_graph_exact_fixed_point(tmp_path, spark):
    """Two-component graph: user 1 walks a->b->a->b (edges a->b x2,
    b->a x1), user 2 walks c->d. Seed = 'a' (lexicographic min). The
    c/d component is unreachable from the seed, so its personalized
    ranks must be exactly 0; a and b follow the integer fixed-point
    recurrence by hand:
      r1 = (a: 0.15e9, b: 0.85e9)
      r2 = (a: 0.15e9 + 85%*0.85e9 = 872500000, b: 85%*0.15e9 = 127500000)
      r3 = (a: 0.15e9 + 85%*127500000 = 258375000, b: 85%*872500000
            = 741625000)"""
    d = lambda h: dt.datetime(2024, 1, 10, h)  # noqa: E731
    ev = [
        (1, d(1), 1, "a", 1.0, None),
        (2, d(2), 1, "b", 1.0, None),
        (3, d(3), 1, "a", 1.0, None),
        (4, d(4), 1, "b", 1.0, None),
        (5, d(1), 2, "c", 1.0, None),
        (6, d(2), 2, "d", 1.0, None),
    ]
    sf = _write_events(tmp_path, ev)
    rows = queries()["graph_ppr_unrolled"](spark, sf).collect()
    got = {r["node"]: (r["seed"], r["ppr_fp"]) for r in rows}
    assert got == {
        "a": ("a", 258375000),
        "b": ("a", 741625000),
        "c": ("a", 0),
        "d": ("a", 0),
    }, got


def test_coincidence_factor_hand(tmp_path, spark):
    """Unit X peaks at hour 1 (10), unit Y at hour 2 (8): the system
    never sees 18 -- system peak is 10, coincidence 10/18 = 0.5556,
    diversity 1.8."""
    ev = [
        (1, dt.datetime(2024, 1, 10, 1), 1, "X", 10.0, None),
        (2, dt.datetime(2024, 1, 10, 2), 1, "Y", 8.0, None),
    ]
    sf = _write_events(tmp_path, ev)
    rows = queries()["ts_coincidence_factor"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["n_units"],
        r["sum_unit_peaks"],
        r["system_peak"],
        r["coincidence_factor"],
        r["diversity_factor"],
    ) == (2, 18.0, 10.0, 0.5556, 1.8), r


def test_stream_kmv_equals_batch_merge(spark, sf_dir):
    """The streaming fold must land exactly the batch merge's sketch
    (both equal the global bottom-k): same n_exact / n_state /
    kmv_estimate per group, whatever micro-batch order the engine
    picked."""
    stream_rows = {
        r["event_type"]: (r["n_exact"], r["n_state"], r["kmv_estimate"])
        for r in queries()["stream_kmv_merge"](spark, sf_dir).collect()
    }
    batch_rows = {
        r["event_type"]: (r["n_exact"], r["n_state"], r["kmv_estimate"])
        for r in queries()["inc_kmv_distinct_merge"](spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
