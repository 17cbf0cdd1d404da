"""The end-to-end corpus-prep flagship lanes.

``corpus_prep_e2e`` composes the already-individually-proven stages of a
pretraining-corpus pipeline into ONE lineage (VERDICT r8 item 5) -- the
north-star workload run as a single query instead of six lanes:

  raw documents
    -> Gopher quality gate        (text_quality_gopher's per-doc rules)
    -> exact dedup                (dedup_exact_stats's normalized-md5 key)
    -> MinHash near-dup,          (dedup_minhash_lsh_pairs -> clusters ->
       keep-canonical              dedup_keep_best's argmax-quality pick)
    -> benchmark decontamination  (dedup_contamination_check's n-gram
                                   overlap vs the held-out doc_id%25 set)
    -> temperature mix            (sample_temperature_mix's tau=0.3 shares)

Output: one row per source with the survivor count after every stage plus
the final natural/temperature sampling shares -- the numbers a pipeline
owner actually reads off a corpus-prep run. The DuckDB oracle replays all
five stages as chained CTEs over the same parquet, so a hash match proves
the COMPOSITION (stage ordering, survivor threading, cross-stage
cache/lineage interactions), not just each stage in isolation.

Scale shape: every stage is the proven per-lane design (banded LSH join,
broadcast bench grams, id-semi-joins back to the base scan); between
stages only (doc_id, source) manifests materialize -- the corpus text
itself is re-read from the columnar base scan per stage, never shuffled
forward. Reference behavior base: the reference pipeline's
extract->validate->transform chain (`core/airflow_dag.py:214-420`)
generalized to the LLM-corpus mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators import dedup as DD
from electricity_forecast_pipeline_airflow_k8s_spark.operators import text as TX
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.textops import (
    MINHASH_BANDS,
    MINHASH_K,
    _SHINGLES,
    _TOKS,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.textops2 import (
    gopher_doc_flags,
    gopher_flags_sql,
)

_E2E_TAU = 0.3
_E2E_NEARDUP_T = 0.5
_E2E_CONTAM_N = 3  # synthetic-vocab n (the per-lane _CONTAM_N rationale)
# decontamination keep rule: contaminated/total <= 1/5, checked in exact
# integer arithmetic (m * 5 <= n) so no float boundary exists
_E2E_CONTAM_DEN = 5
# The gate applies the six content-shape Gopher rules. The seventh
# (>= 2 distinct English stop words) is excluded: the synthetic fixture's
# vocabulary contains no English stop words, so on this corpus the
# published rule degenerates to "delete every document" and the
# composition under test would be vacuous. It stays measured per source
# in text_quality_gopher.
_E2E_GATE_FLAGS = ("f_wc", "f_mwl", "f_sym", "f_bullet", "f_ellipsis", "f_alpha")


def _minhash_sql_parts() -> tuple[str, str]:
    """(sig column list, banded UNION ALL) for the e2e oracle -- the same
    k/bands construction as textops._minhash_oracle, over CTE ``e2e_sh``."""
    rows = MINHASH_K // MINHASH_BANDS
    sig_cols = ",\n         ".join(
        f"list_aggregate(list_transform(sh, s -> md5('{i}|' || s)), 'min') AS sig_{i}"
        for i in range(MINHASH_K)
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, md5({parts}) AS h FROM e2e_sigs".format(
            b=b,
            parts=" || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(MINHASH_BANDS)
    )
    return sig_cols, band_rows


def _e2e_oracle() -> str:
    sig_cols, band_rows = _minhash_sql_parts()
    gate = " + ".join(f"g.{c}" for c in _E2E_GATE_FLAGS)
    return f"""
WITH RECURSIVE
{gopher_flags_sql("documents")},
s1 AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN gopher_flags g ON g.doc_id = d.doc_id
  WHERE {gate} = 0
),
keyed AS (
  SELECT *, coalesce(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))),
                     '__null_text__') AS fp
  FROM s1
),
s2 AS (
  SELECT k.doc_id, k.source, k.text
  FROM keyed k
  JOIN (SELECT fp, min(doc_id) AS doc_id FROM keyed GROUP BY 1) keep
    ON keep.fp = k.fp AND keep.doc_id = k.doc_id
),
e2e_toks AS (SELECT doc_id, {_TOKS} AS t FROM s2),
e2e_sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM e2e_toks WHERE len(t) >= 3),
e2e_sigs AS (SELECT doc_id, sh, {sig_cols} FROM e2e_sh),
e2e_bands AS (
{band_rows}
),
e2e_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM e2e_bands a JOIN e2e_bands b
    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
),
e2e_verified AS (
  SELECT c.doc_a, c.doc_b
  FROM e2e_cand c
  JOIN e2e_sh sa ON sa.doc_id = c.doc_a
  JOIN e2e_sh sb ON sb.doc_id = c.doc_b
  WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0
        / len(list_distinct(list_concat(sa.sh, sb.sh))) >= {_E2E_NEARDUP_T}
),
e2e_edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM e2e_verified
  UNION SELECT doc_b, doc_a FROM e2e_verified
),
e2e_reach(node, comp) AS (
  SELECT src, src FROM e2e_edges
  UNION
  SELECT e.src, r.comp FROM e2e_edges e JOIN e2e_reach r ON e.dst = r.node
),
e2e_comp AS (SELECT node, min(comp) AS component FROM e2e_reach GROUP BY node),
e2e_scored AS (SELECT doc_id, len(list_distinct(t)) AS q FROM e2e_toks),
e2e_rk AS (
  SELECT c.component, c.node,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY s.q DESC, c.node) AS rn
  FROM e2e_comp c JOIN e2e_scored s ON s.doc_id = c.node
),
e2e_drop AS (SELECT node FROM e2e_rk WHERE rn > 1),
s3 AS (
  SELECT * FROM s2 WHERE doc_id NOT IN (SELECT node FROM e2e_drop)
),
bench_toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 25 = 0
),
bench_grams AS (SELECT DISTINCT unnest({_SHINGLES}) AS g FROM bench_toks),
s3c AS (SELECT * FROM s3 WHERE doc_id % 25 <> 0),
c_toks AS (SELECT doc_id, {_TOKS} AS t FROM s3c),
c_grams AS (SELECT doc_id, {_SHINGLES} AS gs FROM c_toks),
matched AS (
  SELECT e.doc_id, count(*) AS m
  FROM (SELECT doc_id, unnest(gs) AS g FROM c_grams) e
  JOIN bench_grams b USING (g) GROUP BY 1
),
s4 AS (
  SELECT s.doc_id, s.source
  FROM s3c s
  JOIN c_grams g USING (doc_id)
  LEFT JOIN matched m USING (doc_id)
  WHERE coalesce(m.m, 0) * {_E2E_CONTAM_DEN} <= len(g.gs)
),
srcs AS (SELECT DISTINCT source FROM documents),
c0 AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
c1 AS (SELECT source, count(*) AS n FROM s1 GROUP BY 1),
c2 AS (SELECT source, count(*) AS n FROM s2 GROUP BY 1),
c3 AS (SELECT source, count(*) AS n FROM s3 GROUP BY 1),
c4 AS (SELECT source, count(*) AS n FROM s4 GROUP BY 1),
mixbase AS (
  SELECT srcs.source, coalesce(c4.n, 0) AS n4
  FROM srcs LEFT JOIN c4 USING (source)
),
tot AS (SELECT sum(n4) AS nt FROM mixbase),
w AS (
  SELECT m.source, m.n4, m.n4 * 1.0 / t.nt AS p,
         pow(m.n4 * 1.0 / t.nt, {_E2E_TAU}) AS pw
  FROM mixbase m CROSS JOIN tot t
),
norm AS (SELECT sum(pw) AS z FROM (SELECT pw FROM w ORDER BY source))
SELECT w.source,
       CAST(coalesce(c0.n, 0) AS BIGINT) AS n_raw,
       CAST(coalesce(c1.n, 0) AS BIGINT) AS n_quality,
       CAST(coalesce(c2.n, 0) AS BIGINT) AS n_exact,
       CAST(coalesce(c3.n, 0) AS BIGINT) AS n_neardup,
       CAST(w.n4 AS BIGINT) AS n_decontam,
       floor(w.p * 1000000 + 0.5) / 1000000 AS natural_share,
       floor(w.pw / nm.z * 1000000 + 0.5) / 1000000 AS temp_share
FROM w
LEFT JOIN c0 ON c0.source = w.source
LEFT JOIN c1 ON c1.source = w.source
LEFT JOIN c2 ON c2.source = w.source
LEFT JOIN c3 ON c3.source = w.source
CROSS JOIN norm nm
ORDER BY w.source
"""


def corpus_prep_stages(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The five survivor frames, each a (doc_id, source, text) DataFrame.

    Stage manifests (doc_id, source) are eagerly materialized via
    localCheckpoint between stages: each downstream stage re-joins its
    manifest onto the columnar base scan instead of replaying every prior
    stage's text work per consumer -- the multi-stage corpus pipeline's
    write-manifest-between-stages discipline, with only id-sized state
    carried forward."""
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.partitioning import (
        fanout,
    )

    # round-11 (guide §2.5 input skew): the fixture arrives as ONE parquet
    # row group -> one scan task, serializing every stage's per-doc text
    # work (gopher flags, fingerprints, minhash signatures) onto a single
    # core; fan the narrow base frame out once, all stages inherit it. At
    # real scale (many splits) fanout is a no-op.
    docs = fanout(
        table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    )

    def manifest(df: DataFrame) -> DataFrame:
        # round-11: LAZY checkpoint (guide §2.6/§5) -- still a lineage cut
        # with block reuse across consumers, but materialized inside the
        # consuming job instead of one sequential build-time job per
        # stage, so independent stage branches share a DAG and the
        # scheduler overlaps them.
        return df.select("doc_id", "source").localCheckpoint(eager=False)

    # stage 1: Gopher quality gate (the six content-shape rules;
    # _E2E_GATE_FLAGS explains the stop-word exclusion)
    flags = gopher_doc_flags(docs)
    gate_total = F.lit(0)
    for c in _E2E_GATE_FLAGS:
        gate_total = gate_total + F.col(c)
    m1 = manifest(flags.filter(gate_total == 0))
    s1 = docs.join(m1.select("doc_id"), "doc_id", "left_semi")

    # stage 2: exact dedup (normalized-md5 key, keep min doc_id)
    m2 = manifest(DD.exact_dedup(s1))
    s2 = docs.join(m2.select("doc_id"), "doc_id", "left_semi")

    # stage 3: MinHash near-dup clusters, keep the best doc per cluster
    # (max distinct-token count, ties to the smaller doc_id)
    pairs = DD.minhash_lsh_dedup_pairs(
        s2, k=MINHASH_K, bands=MINHASH_BANDS, threshold=_E2E_NEARDUP_T
    )
    cc = DD.connected_components(pairs)
    scored = s2.select(
        "doc_id", F.size(F.array_distinct(TX.tokens("text"))).alias("q")
    )
    j = cc.join(scored, cc["node"] == scored["doc_id"]).select(
        "component", "node", "q"
    )
    kept = j.groupBy("component").agg(
        F.max(
            F.struct(F.col("q").alias("q"), (-F.col("node")).alias("negnode"))
        ).alias("_b")
    ).select((-F.col("_b.negnode")).alias("doc_id"))
    dropped = cc.select(F.col("node").alias("doc_id")).join(
        kept, "doc_id", "left_anti"
    )
    m3 = manifest(m2.join(dropped, "doc_id", "left_anti"))
    s3 = docs.join(m3.select("doc_id"), "doc_id", "left_semi")

    # stage 4: benchmark decontamination (held-out doc_id%25 grams; keep
    # when contaminated * DEN <= total, exact integer compare)
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    s3c = s3.filter(F.col("doc_id") % 25 != 0)
    contam = DD.ngram_contamination(s3c, bench, n=_E2E_CONTAM_N)
    keep_ids = contam.filter(
        F.col("contaminated_ngrams") * _E2E_CONTAM_DEN <= F.col("n_ngrams")
    ).select("doc_id")
    m4 = manifest(s3c.join(keep_ids, "doc_id", "left_semi"))
    s4 = docs.join(m4.select("doc_id"), "doc_id", "left_semi")

    return {"raw": docs, "s1": s1, "s2": s2, "s3": s3, "s4": s4,
            "m1": m1, "m2": m2, "m3": m3, "m4": m4}


@register("corpus_prep_e2e", oracle=_e2e_oracle())
def q_corpus_prep_e2e(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    st = corpus_prep_stages(spark, sf_dir)

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("source").agg(F.count(F.lit(1)).alias(name))

    srcs = st["raw"].select("source").distinct()
    out = srcs
    for name, df in (
        ("n_raw", st["raw"]),
        ("n_quality", st["m1"]),
        ("n_exact", st["m2"]),
        ("n_neardup", st["m3"]),
        ("n_decontam", st["m4"]),
    ):
        out = out.join(cnt(df, name), "source", "left")
    # #sources-row frame, materialized once: the mix total below consumes
    # it a second time, and without the cut the crossJoin would replay
    # every per-source count scan per consumer
    counts = out.select(
        "source",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("n_raw", "n_quality", "n_exact", "n_neardup", "n_decontam")
        ],
    ).localCheckpoint(eager=True)
    # temperature mix over the final survivors; the #sources-sized
    # normalizer sums in deterministic source order (the
    # sample_temperature_mix window pattern), mirrored by the oracle's
    # ordered-subquery sum
    tot = counts.agg(F.sum("n_decontam").alias("nt"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        "*",
        (F.col("n_decontam") * 1.0 / F.col("nt")).alias("p"),
        F.pow(F.col("n_decontam") * 1.0 / F.col("nt"), F.lit(_E2E_TAU)).alias(
            "pw"
        ),
    )
    win = W.orderBy("source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        w.withColumn("z", F.sum("pw").over(win))
        .select(
            "source",
            "n_raw",
            "n_quality",
            "n_exact",
            "n_neardup",
            "n_decontam",
            (F.floor(F.col("p") * 1000000 + 0.5) / 1000000).alias(
                "natural_share"
            ),
            (F.floor(F.col("pw") / F.col("z") * 1000000 + 0.5) / 1000000).alias(
                "temp_share"
            ),
        )
        .orderBy("source")
    )


# -- incremental corpus-prep maintenance (the capstone inc_* contract) ---------
# corpus_prep_e2e proves the composition from scratch; at 100 TB the
# corpus is MAINTAINED: yesterday's pipeline state + today's document
# batch -> updated survivor manifests, never a full recompute. This lane
# drives a genuine merge path:
#
#   state (built once from the "old" corpus, ids < B):
#     gated-id manifest, exact-dedup fingerprint set, banded LSH
#     signature index, verified near-dup edge list, CC labels, and the
#     post-decontamination survivor manifest;
#   merge (touches batch-sized + state-sized frames only):
#     1. quality gate: doc-local, batch only;
#     2. exact dedup: batch fingerprints ANTI-JOIN the state fingerprint
#        set, then keep-min within the batch -- exact because every
#        state id < B <= every batch id, so the scratch keep-min can
#        never prefer a batch doc over a state doc;
#     3. near-dup: batch bands PROBE the (state index + batch bands)
#        postings -- O(batch x postings), the inc_minhash_new_batch
#        shape -- and every probe candidate carries >= 1 batch doc by
#        construction; new verified edges union the state edge list via
#        CC label-merge (state labels as star edges, the
#        inc_cc_new_edges contract), so a batch doc bridging two old
#        clusters correctly RETRACTS the losing old canonical;
#     4. decontamination: the benchmark set is FROZEN at state-build
#        time (old ids % 25 == 0), so old survivors' verdicts are
#        reused from state (intersected with the post-merge cluster
#        survivors) and only batch docs are checked, against the
#        broadcast bench grams.
#
# Canonical policy here is KEEP-MIN-ID (keep-first), not e2e's
# keep-best-quality: keep-first is the policy incremental pipelines
# actually run, because the canonical of a cluster can then only change
# when clusters MERGE -- a quality-argmax canonical would be unstable
# under every batch (any new higher-quality member evicts the published
# doc). The DuckDB oracle is the SCRATCH rebuild of the same pipeline
# over old+batch together -- a hash match proves merge == rebuild, the
# inc_* family contract, now at whole-pipeline grain.
def _inc_oracle() -> str:
    sig_cols, band_rows = _minhash_sql_parts()
    gate = " + ".join(f"g.{c}" for c in _E2E_GATE_FLAGS)
    return f"""
WITH RECURSIVE
bnd AS (
  SELECT CAST(((max(doc_id) + 1) * 9) // 10 AS BIGINT) AS b FROM documents
),
{gopher_flags_sql("documents")},
s1 AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN gopher_flags g ON g.doc_id = d.doc_id
  WHERE {gate} = 0
),
keyed AS (
  SELECT *, coalesce(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))),
                     '__null_text__') AS fp
  FROM s1
),
s2 AS (
  SELECT k.doc_id, k.source, k.text
  FROM keyed k
  JOIN (SELECT fp, min(doc_id) AS doc_id FROM keyed GROUP BY 1) keep
    ON keep.fp = k.fp AND keep.doc_id = k.doc_id
),
e2e_toks AS (SELECT doc_id, {_TOKS} AS t FROM s2),
e2e_sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM e2e_toks WHERE len(t) >= 3),
e2e_sigs AS (SELECT doc_id, sh, {sig_cols} FROM e2e_sh),
e2e_bands AS (
{band_rows}
),
e2e_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM e2e_bands a JOIN e2e_bands b
    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
),
e2e_verified AS (
  SELECT c.doc_a, c.doc_b
  FROM e2e_cand c
  JOIN e2e_sh sa ON sa.doc_id = c.doc_a
  JOIN e2e_sh sb ON sb.doc_id = c.doc_b
  WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0
        / len(list_distinct(list_concat(sa.sh, sb.sh))) >= {_E2E_NEARDUP_T}
),
e2e_edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM e2e_verified
  UNION SELECT doc_b, doc_a FROM e2e_verified
),
e2e_reach(node, comp) AS (
  SELECT src, src FROM e2e_edges
  UNION
  SELECT e.src, r.comp FROM e2e_edges e JOIN e2e_reach r ON e.dst = r.node
),
e2e_comp AS (SELECT node, min(comp) AS component FROM e2e_reach GROUP BY node),
e2e_drop AS (SELECT node FROM e2e_comp WHERE node <> component),
s3 AS (
  SELECT * FROM s2 WHERE doc_id NOT IN (SELECT node FROM e2e_drop)
),
bench_toks AS (
  SELECT d.doc_id, {_TOKS} AS t
  FROM documents d CROSS JOIN bnd
  WHERE d.doc_id % 25 = 0 AND d.doc_id < bnd.b
),
bench_grams AS (SELECT DISTINCT unnest({_SHINGLES}) AS g FROM bench_toks),
s3c AS (SELECT * FROM s3 WHERE doc_id % 25 <> 0),
c_toks AS (SELECT doc_id, {_TOKS} AS t FROM s3c),
c_grams AS (SELECT doc_id, {_SHINGLES} AS gs FROM c_toks),
matched AS (
  SELECT e.doc_id, count(*) AS m
  FROM (SELECT doc_id, unnest(gs) AS g FROM c_grams) e
  JOIN bench_grams b USING (g) GROUP BY 1
),
s4 AS (
  SELECT s.doc_id, s.source
  FROM s3c s
  JOIN c_grams g USING (doc_id)
  LEFT JOIN matched m USING (doc_id)
  WHERE coalesce(m.m, 0) * {_E2E_CONTAM_DEN} <= len(g.gs)
),
srcs AS (SELECT DISTINCT source FROM documents),
c0 AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
c1 AS (SELECT source, count(*) AS n FROM s1 GROUP BY 1),
c2 AS (SELECT source, count(*) AS n FROM s2 GROUP BY 1),
c3 AS (SELECT source, count(*) AS n FROM s3 GROUP BY 1),
c4 AS (SELECT source, count(*) AS n FROM s4 GROUP BY 1),
mixbase AS (
  SELECT srcs.source, coalesce(c4.n, 0) AS n4
  FROM srcs LEFT JOIN c4 USING (source)
),
tot AS (SELECT sum(n4) AS nt FROM mixbase),
w AS (
  SELECT m.source, m.n4, m.n4 * 1.0 / t.nt AS p,
         pow(m.n4 * 1.0 / t.nt, {_E2E_TAU}) AS pw
  FROM mixbase m CROSS JOIN tot t
),
norm AS (SELECT sum(pw) AS z FROM (SELECT pw FROM w ORDER BY source))
SELECT w.source,
       CAST(coalesce(c0.n, 0) AS BIGINT) AS n_raw,
       CAST(coalesce(c1.n, 0) AS BIGINT) AS n_quality,
       CAST(coalesce(c2.n, 0) AS BIGINT) AS n_exact,
       CAST(coalesce(c3.n, 0) AS BIGINT) AS n_neardup,
       CAST(w.n4 AS BIGINT) AS n_decontam,
       floor(w.p * 1000000 + 0.5) / 1000000 AS natural_share,
       floor(w.pw / nm.z * 1000000 + 0.5) / 1000000 AS temp_share
FROM w
LEFT JOIN c0 ON c0.source = w.source
LEFT JOIN c1 ON c1.source = w.source
LEFT JOIN c2 ON c2.source = w.source
LEFT JOIN c3 ON c3.source = w.source
CROSS JOIN norm nm
ORDER BY w.source
"""


def _gate_ids(docs) -> DataFrame:
    """(doc_id, source) manifest of docs passing the six-rule gate."""
    flags = gopher_doc_flags(docs)
    gate_total = F.lit(0)
    for c in _E2E_GATE_FLAGS:
        gate_total = gate_total + F.col(c)
    return flags.filter(gate_total == 0).select("doc_id", "source")


def _fingerprints(docs) -> DataFrame:
    """(doc_id, source, fp) normalized-text fingerprints."""
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.text import (
        fingerprint_expr,
    )

    return docs.select(
        "doc_id",
        "source",
        F.coalesce(fingerprint_expr("text"), F.lit("__null_text__")).alias(
            "fp"
        ),
    )


def _bands_of(docs) -> DataFrame:
    """Banded LSH signature index (doc_id, band, h) -- the postings a
    production pipeline persists beside the corpus."""
    rows = MINHASH_K // MINHASH_BANDS
    sigs = DD.minhash_signature(docs, k=MINHASH_K)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat(*[F.col(f"sig_{b * rows + r}") for r in range(rows)])
            ).alias("h"),
        ).alias(f"b{b}")
        for b in range(MINHASH_BANDS)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bh")
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))


@register("corpus_prep_inc_batch", oracle=_inc_oracle())
def q_corpus_prep_inc_batch(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    from electricity_forecast_pipeline_airflow_k8s_spark.operators.partitioning import (
        fanout,
    )

    # round-11 (guide §2.5): same single-row-group fanout as
    # corpus_prep_stages -- state build AND merge both do per-doc text
    # work (signatures, shingles, gopher flags) that otherwise runs on
    # one scan task.
    docs = fanout(
        table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    )
    max_id = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    # Empty documents table => max() is NULL; cut at 0 so both halves are
    # empty frames and the lane degrades to an empty count result instead
    # of a TypeError (ADVICE r9).
    b_cut = 0 if max_id is None else (int(max_id) + 1) * 9 // 10
    old = docs.filter(F.col("doc_id") < b_cut)
    batch = docs.filter(F.col("doc_id") >= b_cut)

    def ck(df: DataFrame) -> DataFrame:
        # round-11: lazy for the same §2.6 reason as corpus_prep_stages'
        # manifest() -- the CC fixpoints' convergence counts force the
        # upstream segments anyway; everything else materializes inside
        # the consuming job with inter-branch parallelism.
        return df.localCheckpoint(eager=False)

    # ---- state: yesterday's pipeline run over the old corpus -------------
    st_gated = ck(_gate_ids(old))
    st_s1 = old.join(st_gated.select("doc_id"), "doc_id", "left_semi")
    st_fps = ck(_fingerprints(st_s1))
    st_s2_ids = ck(
        st_fps.join(
            st_fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id")),
            ["fp", "doc_id"],
            "left_semi",
        ).select("doc_id", "source")
    )
    st_s2 = old.join(st_s2_ids.select("doc_id"), "doc_id", "left_semi")
    st_index = ck(_bands_of(st_s2))
    st_edges = ck(
        DD.minhash_lsh_dedup_pairs(
            st_s2, k=MINHASH_K, bands=MINHASH_BANDS, threshold=_E2E_NEARDUP_T
        ).select("doc_a", "doc_b")
    )
    st_labels = ck(DD.connected_components(st_edges))
    st_s3_ids = ck(
        st_s2_ids.join(
            st_labels.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        )
    )
    bench = old.filter(F.col("doc_id") % 25 == 0)
    bench_grams = ck(
        bench.select(F.explode(DD.shingles("text")).alias("g")).distinct()
    )
    st_s3c = old.join(
        st_s3_ids.filter(F.col("doc_id") % 25 != 0).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    st_contam = DD.ngram_contamination(st_s3c, bench, n=_E2E_CONTAM_N)
    st_s4_ids = ck(
        st_s3_ids.filter(F.col("doc_id") % 25 != 0).join(
            st_contam.filter(
                F.col("contaminated_ngrams") * _E2E_CONTAM_DEN
                <= F.col("n_ngrams")
            ).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )

    # ---- merge: today's batch against the state artifacts ----------------
    b_gated = ck(_gate_ids(batch))
    b_s1 = batch.join(b_gated.select("doc_id"), "doc_id", "left_semi")
    b_fps = _fingerprints(b_s1)
    # anti-join the state fingerprint set, keep-min within the batch
    b_new_fps = b_fps.join(st_fps.select("fp"), "fp", "left_anti")
    b_s2_ids = ck(
        b_new_fps.join(
            b_new_fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id")),
            ["fp", "doc_id"],
            "left_semi",
        ).select("doc_id", "source")
    )
    b_s2 = batch.join(b_s2_ids.select("doc_id"), "doc_id", "left_semi")
    # postings probe: batch bands join the union index; every candidate
    # carries >= 1 batch doc because the probe side is batch-only
    b_bands = ck(_bands_of(b_s2))
    union_index = st_index.unionByName(b_bands)
    cand = (
        b_bands.alias("a")
        .join(
            union_index.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    merged_ids = st_s2_ids.select("doc_id").unionByName(
        b_s2_ids.select("doc_id")
    )
    sh_all = docs.join(merged_ids, "doc_id", "left_semi").select(
        "doc_id", DD.shingles("text").alias("sh")
    )
    new_edges = (
        cand.join(
            sh_all.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}),
            "doc_a",
        )
        .join(
            sh_all.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}),
            "doc_b",
        )
        .filter(
            F.try_divide(
                F.size(F.array_intersect("sh_a", "sh_b")),
                F.size(F.array_union("sh_a", "sh_b")),
            )
            >= _E2E_NEARDUP_T
        )
        .select("doc_a", "doc_b")
    )
    # CC label-merge: old components enter as star edges (node -> label)
    star = st_labels.select(
        F.col("node").alias("doc_a"), F.col("component").alias("doc_b")
    ).filter(F.col("doc_a") != F.col("doc_b"))
    merged_labels = DD.connected_components(star.unionByName(new_edges))
    s3_ids = ck(
        st_s2_ids.unionByName(b_s2_ids).join(
            merged_labels.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        )
    )
    # decontamination: state verdicts reused (bench frozen), batch checked
    b_s3c = batch.join(
        s3_ids.filter(
            (F.col("doc_id") >= b_cut) & (F.col("doc_id") % 25 != 0)
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    b_contam = DD.ngram_contamination(b_s3c, bench, n=_E2E_CONTAM_N)
    b_s4_ids = (
        s3_ids.filter(
            (F.col("doc_id") >= b_cut) & (F.col("doc_id") % 25 != 0)
        )
        .join(
            b_contam.filter(
                F.col("contaminated_ngrams") * _E2E_CONTAM_DEN
                <= F.col("n_ngrams")
            ).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    s4_ids = ck(
        st_s4_ids.join(s3_ids.select("doc_id"), "doc_id", "left_semi")
        .unionByName(b_s4_ids)
    )

    # ---- per-source stage counts + final mix (merged manifests) ----------
    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("source").agg(F.count(F.lit(1)).alias(name))

    srcs = docs.select("source").distinct()
    out = srcs
    for name, df in (
        ("n_raw", docs),
        ("n_quality", st_gated.unionByName(b_gated)),
        ("n_exact", st_s2_ids.unionByName(b_s2_ids)),
        ("n_neardup", s3_ids),
        ("n_decontam", s4_ids),
    ):
        out = out.join(cnt(df, name), "source", "left")
    counts = out.select(
        "source",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("n_raw", "n_quality", "n_exact", "n_neardup", "n_decontam")
        ],
    ).localCheckpoint(eager=True)
    tot = counts.agg(F.sum("n_decontam").alias("nt"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        "*",
        (F.col("n_decontam") * 1.0 / F.col("nt")).alias("p"),
        F.pow(F.col("n_decontam") * 1.0 / F.col("nt"), F.lit(_E2E_TAU)).alias(
            "pw"
        ),
    )
    win = W.orderBy("source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        w.withColumn("z", F.sum("pw").over(win))
        .select(
            "source",
            "n_raw",
            "n_quality",
            "n_exact",
            "n_neardup",
            "n_decontam",
            (F.floor(F.col("p") * 1000000 + 0.5) / 1000000).alias(
                "natural_share"
            ),
            (F.floor(F.col("pw") / F.col("z") * 1000000 + 0.5) / 1000000).alias(
                "temp_share"
            ),
        )
        .orderBy("source")
    )
