"""Prefix-filtering set-similarity join (operators/setsim.py).

Pins exactness against an in-Python brute force over random corpora at
several thresholds (the prefix filter must lose NOTHING), the integer
prefix-length math, and the doc_a < doc_b / null-text contracts.
"""

from __future__ import annotations

import itertools
import math
import random

import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.operators.setsim import (
    setsim_prefix_join,
)


def _brute_force(docs: list[tuple[str, str]], t: float) -> dict[tuple[str, str], float]:
    sets = {i: frozenset(x.split()) for i, x in docs if x is not None and x.split()}
    out = {}
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= t - 1e-12:
            out[(ia, ib)] = j
    return out


VOCAB = [f"w{i}" for i in range(30)]


def _random_corpus(rng: random.Random, n: int) -> list[tuple[str, str]]:
    docs = []
    for i in range(n):
        base = rng.sample(VOCAB, rng.randint(3, 12))
        docs.append((f"d{i:03d}", " ".join(base)))
        # near-duplicates: copy with small edits so high thresholds hit
        if rng.random() < 0.5:
            dup = list(base)
            if rng.random() < 0.5 and len(dup) > 3:
                dup.pop()
            else:
                dup.append(rng.choice(VOCAB))
            docs.append((f"d{i:03d}x", " ".join(dup)))
    return docs


@pytest.mark.parametrize("num,den", [(1, 2), (7, 10), (9, 10), (1, 1)])
def test_exact_vs_brute_force(spark, num, den):
    rng = random.Random(4242 + num * 100 + den)
    docs = _random_corpus(rng, 25)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in setsim_prefix_join(df, num=num, den=den).collect()
    }
    want = _brute_force(docs, num / den)
    assert set(got) == set(want)
    for pair, j in want.items():
        assert got[pair] == pytest.approx(math.floor(j * 10000 + 0.5) / 10000)


def test_identical_docs_pair_at_threshold_one(spark):
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "z y x"), ("c", "x y")],
        "doc_id string, text string",
    )
    rows = setsim_prefix_join(df, num=1, den=1).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows] == [("a", "b", 1.0)]


def test_null_and_empty_text_excluded(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "   "), ("c", "x y"), ("d", "x y")],
        "doc_id string, text string",
    )
    rows = setsim_prefix_join(df, num=1, den=2).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [("c", "d")]


def test_pair_order_contract(spark):
    rng = random.Random(7)
    docs = _random_corpus(rng, 20)
    rows = setsim_prefix_join(
        spark.createDataFrame(docs, "doc_id string, text string"), num=1, den=2
    ).collect()
    assert all(r["doc_a"] < r["doc_b"] for r in rows)
    assert len({(r["doc_a"], r["doc_b"]) for r in rows}) == len(rows)
