"""Round-9 lanes: the corpus-prep composition and its incremental merge.

The sf fixtures exercise the cross-batch probe path (dozens of old-batch
near-dup edges at sf0.1) but cannot guarantee the MERGE-RETRACTION case:
a batch document bridging two previously-separate state clusters, which
must retract the losing old canonical from the merged survivor set. The
synthetic corpus here manufactures exactly that, and the assertion runs
the REGISTERED Spark lane against the REGISTERED DuckDB oracle on the
same parquet -- the driver's comparison, on the adversarial input."""

import os
import duckdb
import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry


def _block(prefix: str, n: int = 30) -> str:
    return " ".join(f"{prefix}word{i:02d}" for i in range(n))


@pytest.fixture()
def bridge_corpus(spark, tmp_path):
    """ids 0..9; cut = (9+1)*9//10 = 9 -> old = 0..8, batch = {9}.

    A(0) = P+X and B(1) = P+Y share only the P block (jaccard ~1/3, below
    the 0.5 threshold -> SEPARATE state clusters); C(9) = P+X+Y overlaps
    both above threshold -> the merged cluster {0, 1, 9} keeps only the
    min id 0, so the merge must RETRACT old survivor 1. Fillers 2..8 pass
    the gate and survive to the end (keeps the mix total nonzero; doc 0
    is the frozen bench doc, id%25==0)."""
    P, X, Y = _block("p"), _block("x"), _block("y")
    rows = [
        (0, "sa", f"{P} {X}"),
        (1, "sa", f"{P} {Y}"),
        (9, "sb", f"{P} {X} {Y}"),
    ]
    for i in range(2, 9):
        rows.append((i, "sb" if i % 2 else "sa", _block(f"f{i}", 60)))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # the loader reads {sf_dir}/documents.parquet
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _collect(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~78 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_inc_batch_bridge_retracts_old_canonical(spark, bridge_corpus):
    q = registry()["corpus_prep_inc_batch"]
    got = q.build(spark, bridge_corpus)
    rows = {r["source"]: r.asDict() for r in got.collect()}
    # stage counts: all 10 pass the gate, all distinct (n_exact = 10);
    # the merged cluster {0,1,9} keeps only doc 0 -> n_neardup = 8,
    # and crucially OLD doc 1 ("sa") is gone even though the state run
    # alone had no near-dup edges at all.
    assert sum(r["n_quality"] for r in rows.values()) == 10
    assert sum(r["n_exact"] for r in rows.values()) == 10
    assert sum(r["n_neardup"] for r in rows.values()) == 8
    # sa = {0,1,2,4,6,8}: retracting old doc 1 leaves {0,2,4,6,8}
    assert rows["sa"]["n_neardup"] == 5
    # sb = {3,5,7,9}: batch doc 9 is the cluster's non-canonical member
    assert rows["sb"]["n_neardup"] == 3
    # doc 0 is the bench doc (id%25==0, excluded from s4); docs 2..8 pass
    assert sum(r["n_decontam"] for r in rows.values()) == 7
    # the registered oracle on the same parquet agrees value-for-value
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{bridge_corpus}/documents.parquet/*.parquet'"
    )
    oracle = con.execute(q.oracle).fetchall()
    spark_rows = [
        tuple(r)
        for r in got.collect()
    ]
    assert [tuple(map(_norm, r)) for r in spark_rows] == [
        tuple(map(_norm, r)) for r in oracle
    ]


def _norm(v):
    return round(v, 6) if isinstance(v, float) else v


def test_e2e_and_inc_agree_when_batch_changes_nothing(spark, tmp_path):
    """When the batch contains no duplicates of state docs, the merge's
    survivor COUNTS per stage must equal the scratch composition's with
    the same keep-min policy -- here checked on a corpus of all-unique
    docs (no near-dup clusters at all), where e2e (keep-best) and inc
    (keep-first) coincide because every cluster is a singleton."""
    rows = [
        (i, "sa" if i % 3 else "sb", _block(f"u{i}", 55)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    reg = registry()
    # the e2e lane's bench set is all-ids%25==0 vs inc's old-ids%25==0:
    # identical here because every %25==0 id (0) is < the 90% cut (18)
    e2e = {
        r["source"]: (r["n_quality"], r["n_exact"], r["n_neardup"], r["n_decontam"])
        for r in reg["corpus_prep_e2e"].build(spark, sf).collect()
    }
    inc = {
        r["source"]: (r["n_quality"], r["n_exact"], r["n_neardup"], r["n_decontam"])
        for r in reg["corpus_prep_inc_batch"].build(spark, sf).collect()
    }
    assert e2e == inc


def test_inc_batch_empty_documents_degrades_gracefully(spark, tmp_path):
    """ADVICE r9: max(doc_id) on an empty documents table is NULL; the
    lane must default the batch cut to 0 and return an empty counts frame
    instead of raising TypeError on int(None) -- the graceful-degradation
    contract every other lane meets on degenerate inputs."""
    empty = spark.createDataFrame([], "doc_id long, source string, text string")
    empty.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = registry()["corpus_prep_inc_batch"].build(spark, str(tmp_path))
    assert out.count() == 0
