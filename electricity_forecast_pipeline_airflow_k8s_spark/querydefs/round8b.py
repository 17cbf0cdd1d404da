"""Round-8 continuation: the remaining production shapes a 100 TB corpus
pipeline runs that the registry didn't yet cover --

- ``rel_scd2_merge``      incremental SCD type-2 maintenance (the lakehouse
                          MERGE): persisted interval state + a change batch
                          -> updated intervals, hash-proven equal to a
                          scratch rebuild over the full history.
- ``text_span_dedup``     cross-document repeated-SPAN detection (the exact
                          -substring dedup of Lee et al. 2022, token-gram
                          approximation): positions whose k-gram recurs in
                          another document, merged to maximal spans.
- ``text_quality_gopher`` the published Gopher (Rae et al. 2021, A1.1)
                          document-quality rules as one pass, aggregated
                          per source with per-rule failure counts.
- ``sim_int8_recall``     what scalar int8 quantization costs retrieval:
                          top-10 recall of symmetric int8 distance against
                          exact-L2 truth (the quantization audit beside
                          sim_pq_adc_recall's PQ audit).
- ``layout_bloom_pruning`` bloom-filter file skipping on the layout where
                          zone maps are useless (point lookups on a column
                          uncorrelated with sort order) -- the second half
                          of the lakehouse pruning story started by
                          layout_zonemap_pruning.

Reference behavior base: the reference pipeline re-extracts snapshots and
keeps newest-K files (`core/airflow_dag.py:595-615`); these are the
finer-grained warehouse/corpus-maintenance forms a Spark engine owes on
top (SURVEY.md north-star extension). Every threshold filters the RAW
ratio and rounds only outputs (the ADVICE r7 boundary rule).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators import text as TX
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.round8 import (
    _QCUT,
    _SCD2_ORACLE,
    _scd2_change_flag,
    _scd2_islands,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.textops import _TOKS
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.validation import (
    EVENTS_SRC,
)

# -- incremental SCD type-2 maintenance (the lakehouse MERGE) ------------------
# rel_scd2_intervals builds type-2 history from scratch; at 100 TB the
# dimension is MAINTAINED: yesterday's interval table (change-count-sized
# state, never the event log) + today's event batch -> updated intervals.
# Merge algebra:
#   1. affected keys = keys present in the batch; everyone else's state
#      rows pass through untouched (never read the old event log);
#   2. per affected key, the state's CURRENT row becomes one pseudo-event
#      (its attr at its valid_from, carrying its n_events and version) in
#      front of the batch's events -- so a batch that RENEWS the current
#      value extends the current island (version and valid_from keep,
#      counts add), and a change opens version cur+1: exactly what the
#      scratch gaps-and-islands computes across the boundary;
#   3. closed state rows and merged tails re-key through one lead() over
#      the per-key version frame (interval-count-sized) for valid_to /
#      is_current.
# The oracle is the SAME full-history scratch rebuild rel_scd2_intervals
# registers -- a hash match proves merge == rebuild (the inc_* contract).
# Cost: windows only over (1 + batch-events) rows per affected key; state
# passes through with no window until the tiny per-version lead.


@register("rel_scd2_merge", oracle=_SCD2_ORACLE)
def q_rel_scd2_merge(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("user_id") < 100)
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    cut = F.lit(_QCUT).cast("timestamp")
    old, batch = ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)

    # yesterday's persisted state (intervals, not events) -- built by the
    # SAME island helper the scratch query uses, so merge and rebuild
    # can't drift semantically
    state = _scd2_islands(old)

    affected = batch.select("user_id").distinct()
    st_aff = state.join(affected, "user_id")
    w_desc = Window.partitionBy("user_id").orderBy(F.desc("version"))
    cur = (
        st_aff.withColumn("_rn", F.row_number().over(w_desc))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    closed = (
        st_aff.join(
            cur.select("user_id", F.col("version").alias("_cv")), "user_id"
        )
        .filter(F.col("version") < F.col("_cv"))
        .drop("_cv")
    )
    untouched = state.join(affected, "user_id", "left_anti")

    # the current row as a pseudo-event in front of the batch
    pseudo = cur.select(
        "user_id",
        F.col("attr_value").alias("event_type"),
        F.col("valid_from").alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
        F.col("n_events").alias("_base"),
        F.col("version").alias("_bv"),
    )
    b2 = batch.select(
        "user_id",
        "event_type",
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
        F.lit(0).cast("long").alias("_base"),
        F.lit(None).cast("int").alias("_bv"),
    )
    comb = pseudo.unionByName(b2)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tagged = comb.withColumn(
        "_local",
        F.sum(_scd2_change_flag(w))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    ).withColumn("_kv", F.max("_bv").over(Window.partitionBy("user_id")))
    # island 1 (the one holding the pseudo-event) keeps the current
    # version; later islands number on from it; brand-new keys start at 1
    tail = tagged.groupBy(
        "user_id",
        (F.coalesce(F.col("_kv"), F.lit(1)) + F.col("_local") - 1)
        .cast("int")
        .alias("version"),
    ).agg(
        F.min("event_type").alias("attr_value"),
        F.min("ts").alias("valid_from"),
        F.sum(
            F.when(F.col("_bv").isNotNull(), F.col("_base")).otherwise(F.lit(1))
        ).alias("n_events"),
    )

    final = closed.unionByName(untouched).unionByName(tail)
    wv = Window.partitionBy("user_id").orderBy("version")
    return final.select(
        "user_id",
        "version",
        "attr_value",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    ).orderBy("user_id", "version")


# -- cross-document repeated-span detection ------------------------------------
# The exact-substring half of dedup that shingle/minhash misses: WHICH
# token ranges of a document recur verbatim elsewhere (boilerplate
# headers, license blocks, quoted passages) -- the spans an exact-
# substring dedup (Lee et al. 2022) would cut. Token 5-gram positions
# whose gram occurs in >= 2 DISTINCT documents are duplicated; since
# 5-grams overlap, consecutive duplicated start positions are one
# contiguous region, so a gaps-and-islands pass merges them into MAXIMAL
# spans (>= _SPAN_MIN_GRAMS grams, i.e. >= 7 shared tokens). Document
# frequency is computed over the FULL corpus; only doc_id < 300 spans
# are emitted (the bounded-payload convention). Scale: gram df is a
# map-side-combinable aggregate joined back onto the positional stream
# (the deliberate groupBy+join-back shape of text_ngram_novelty -- no
# gram-partition window hot spot when boilerplate grams dominate); the
# island window partitions by doc.
_SPAN_K, _SPAN_DF, _SPAN_MIN_GRAMS, _SPAN_DOCS = 5, 2, 3, 300


def _span_gram_positions(toks):
    """Shared gram machinery for text_span_dedup / text_span_dedup_impact
    (ONE definition, so the impact number always describes the spans the
    dedup lane reports): from (doc_id, t) build the positional 5-gram
    stream (1-based i, gram at tokens i..i+4) and the set of grams
    occurring in >= _SPAN_DF distinct documents (groupBy + join-back --
    map-side combinable, never a gram-partition window)."""
    gram = lambda _, j: F.concat_ws(  # noqa: E731
        " ", *[F.col("t")[j + d] for d in range(_SPAN_K)]
    )
    pos = (
        toks.filter(F.size("t") >= _SPAN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(F.slice("t", 1, F.size("t") - (_SPAN_K - 1)), gram)
            ).alias("i0", "g"),
        )
        .select("doc_id", (F.col("i0") + 1).cast("int").alias("i"), "g")
    )
    dfreq = (
        pos.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= _SPAN_DF)
        .select("g")
    )
    return pos, dfreq

_SPAN_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
pos AS (
  SELECT doc_id, CAST(i AS INTEGER) AS i,
         array_to_string(t[i:i+{_SPAN_K - 1}], ' ') AS g
  FROM toks, unnest(range(1, len(t) - {_SPAN_K - 2})) r(i)
  WHERE len(t) >= {_SPAN_K}
),
df AS (SELECT g FROM pos GROUP BY g
       HAVING count(DISTINCT doc_id) >= {_SPAN_DF}),
dup AS (SELECT p.doc_id, p.i FROM pos p JOIN df USING (g)
        WHERE p.doc_id < {_SPAN_DOCS}),
marked AS (
  SELECT doc_id, i,
         CASE WHEN lag(i) OVER w IS NULL OR i - lag(i) OVER w > 1
              THEN 1 ELSE 0 END AS brk
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
isl AS (
  SELECT doc_id, i,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
sp AS (
  SELECT doc_id, sid, min(i) AS span_start,
         max(i) + {_SPAN_K - 1} AS span_end, count(*) AS n_grams
  FROM isl GROUP BY 1, 2
)
SELECT doc_id, CAST(span_start AS INTEGER) AS span_start,
       CAST(span_end AS INTEGER) AS span_end,
       CAST(span_end - span_start + 1 AS INTEGER) AS span_tokens,
       CAST(n_grams AS BIGINT) AS n_grams
FROM sp WHERE n_grams >= {_SPAN_MIN_GRAMS}
ORDER BY doc_id, span_start
"""


@register("text_span_dedup", oracle=_SPAN_ORACLE)
def q_text_span_dedup(spark: SparkSession, sf_dir: str):
    docs = table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", TX.tokens("text").alias("t"))
    pos, dfreq = _span_gram_positions(toks)
    dup = pos.join(dfreq, "g").filter(F.col("doc_id") < _SPAN_DOCS)
    w = Window.partitionBy("doc_id").orderBy("i")
    brk = F.when(
        F.lag("i").over(w).isNull() | (F.col("i") - F.lag("i").over(w) > 1), 1
    ).otherwise(0)
    isl = dup.withColumn(
        "sid", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = isl.groupBy("doc_id", "sid").agg(
        F.min("i").alias("span_start"),
        (F.max("i") + (_SPAN_K - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    return (
        spans.filter(F.col("n_grams") >= _SPAN_MIN_GRAMS)
        .select(
            "doc_id",
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("span_tokens"),
            F.col("n_grams").cast("bigint").alias("n_grams"),
        )
        .orderBy("doc_id", "span_start")
    )


# -- Gopher document-quality rules (Rae et al. 2021, Appendix A1.1) ------------
# The published pretraining filter, as one corpus pass aggregated per
# source: word count in [50, 100k], mean word length in [3, 10],
# symbol-to-word ratio ('#' or '...') <= 0.1, <= 90% of lines bullet-
# started, <= 30% of lines ellipsis-ended, >= 80% of words containing an
# alphabetic character, and >= 2 distinct stop words present. Per-rule
# failure counts tell a pipeline owner WHICH rule is cutting a source
# (the actionable number), plus the joint pass rate. Pure column
# expressions -- one scan, one 20-group hash-agg; thresholds compare RAW
# ratios (rounding only the output pct).
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags_sql(rel: str = "documents") -> str:
    """DuckDB CTE chain computing the per-document Gopher rule flags over
    ``rel`` (any relation with doc_id/source/text). Emits CTEs
    ``gopher_d``/``gopher_m``/``gopher_flags``; the last holds one row per
    doc: (doc_id, source, f_wc..f_stop). Shared by the per-source
    aggregate lane and the corpus_prep_e2e composition so both replay the
    IDENTICAL published rules."""
    return f"""
gopher_d AS (
  SELECT doc_id, source, {_TOKS} AS t, text,
         list_filter(list_transform(string_split_regex(text, '\\n'),
                                    s -> trim(s)), s -> s != '') AS lines
  FROM {rel}
),
gopher_m AS (
  SELECT doc_id, source,
         len(t) AS n_tok,
         CASE WHEN len(t) > 0
              THEN list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t)
         END AS mean_wl,
         CASE WHEN len(t) > 0 THEN
           ((length(text) - length(replace(text, '#', '')))
            + (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3
           ) * 1.0 / len(t)
         END AS sym_ratio,
         CASE WHEN len(lines) > 0 THEN
           len(list_filter(lines, s -> starts_with(s, '-')
                                    OR starts_with(s, '*'))) * 1.0 / len(lines)
         ELSE 0.0 END AS bullet_ratio,
         CASE WHEN len(lines) > 0 THEN
           len(list_filter(lines, s -> ends_with(s, '...'))) * 1.0 / len(lines)
         ELSE 0.0 END AS ellipsis_ratio,
         CASE WHEN len(t) > 0 THEN
           len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
             * 1.0 / len(t)
         END AS alpha_ratio,
         len(list_filter({list(_GOPHER_STOPS)},
                         w -> list_contains(t, w))) AS stop_hits
  FROM gopher_d
),
gopher_flags AS (
  SELECT doc_id, source,
         CASE WHEN n_tok < 50 OR n_tok > 100000 THEN 1 ELSE 0 END AS f_wc,
         CASE WHEN n_tok = 0 OR mean_wl < 3 OR mean_wl > 10
              THEN 1 ELSE 0 END AS f_mwl,
         CASE WHEN n_tok = 0 OR sym_ratio > 0.1 THEN 1 ELSE 0 END AS f_sym,
         CASE WHEN bullet_ratio > 0.9 THEN 1 ELSE 0 END AS f_bullet,
         CASE WHEN ellipsis_ratio > 0.3 THEN 1 ELSE 0 END AS f_ellipsis,
         CASE WHEN n_tok = 0 OR alpha_ratio < 0.8 THEN 1 ELSE 0 END AS f_alpha,
         CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END AS f_stop
  FROM gopher_m
)"""


_GOPHER_ORACLE = f"""
WITH {gopher_flags_sql()}
SELECT source, count(*) AS n_docs,
       CAST(sum(f_wc) AS BIGINT) AS fail_word_count,
       CAST(sum(f_mwl) AS BIGINT) AS fail_mean_word_len,
       CAST(sum(f_sym) AS BIGINT) AS fail_symbol_ratio,
       CAST(sum(f_bullet) AS BIGINT) AS fail_bullet_lines,
       CAST(sum(f_ellipsis) AS BIGINT) AS fail_ellipsis_lines,
       CAST(sum(f_alpha) AS BIGINT) AS fail_alpha_words,
       CAST(sum(f_stop) AS BIGINT) AS fail_stop_words,
       CAST(sum(CASE WHEN f_wc + f_mwl + f_sym + f_bullet + f_ellipsis
                        + f_alpha + f_stop = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass,
       floor(sum(CASE WHEN f_wc + f_mwl + f_sym + f_bullet + f_ellipsis
                         + f_alpha + f_stop = 0 THEN 1 ELSE 0 END)
             * 100.0 / count(*) * 10000 + 0.5) / 10000 AS pass_pct
FROM gopher_flags GROUP BY source ORDER BY source
"""


def gopher_doc_flags(docs):
    """Per-document Gopher rule flags (Rae et al. 2021, A1.1) as a
    DataFrame: (doc_id, source, f_wc, f_mwl, f_sym, f_bullet, f_ellipsis,
    f_alpha, f_stop), each 1 = rule violated. Pure column expressions --
    one scan, no shuffle; shared by text_quality_gopher (per-source
    aggregate) and corpus_prep_e2e (document gate)."""
    t = TX.tokens("text")
    lines = F.filter(
        F.transform(F.split("text", r"\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    d = docs.select(
        "doc_id", "source", "text", t.alias("t"), lines.alias("lines")
    )
    n_tok = F.size("t")
    n_lines = F.size("lines")
    mean_wl = F.when(
        n_tok > 0,
        F.aggregate("t", F.lit(0), lambda a, x: a + F.length(x)) * 1.0 / n_tok,
    )
    hash_cnt = F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    ell_cnt = (
        F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / 3
    sym_ratio = F.when(n_tok > 0, (hash_cnt + ell_cnt) * 1.0 / n_tok)
    bullet_ratio = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                "lines",
                lambda s: s.startswith("-") | s.startswith("*"),
            )
        )
        * 1.0
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(
        n_lines > 0,
        F.size(F.filter("lines", lambda s: s.endswith("..."))) * 1.0 / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_tok > 0,
        F.size(F.filter("t", lambda x: x.rlike("[A-Za-z]"))) * 1.0 / n_tok,
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
            lambda w: F.array_contains(F.col("t"), w),
        )
    )
    m = d.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        mean_wl.alias("mean_wl"),
        sym_ratio.alias("sym_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
    )
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    z = F.col("n_tok") == 0
    return m.select(
        "doc_id",
        "source",
        flag((F.col("n_tok") < 50) | (F.col("n_tok") > 100000)).alias("f_wc"),
        flag(z | (F.col("mean_wl") < 3) | (F.col("mean_wl") > 10)).alias(
            "f_mwl"
        ),
        flag(z | (F.col("sym_ratio") > 0.1)).alias("f_sym"),
        flag(F.col("bullet_ratio") > 0.9).alias("f_bullet"),
        flag(F.col("ellipsis_ratio") > 0.3).alias("f_ellipsis"),
        flag(z | (F.col("alpha_ratio") < 0.8)).alias("f_alpha"),
        flag(F.col("stop_hits") < 2).alias("f_stop"),
    )


GOPHER_FLAG_COLS = (
    "f_wc", "f_mwl", "f_sym", "f_bullet", "f_ellipsis", "f_alpha", "f_stop"
)


def gopher_total_fails():
    """Column: number of Gopher rules a doc violates (0 = passes the gate)."""
    total = F.lit(0)
    for c in GOPHER_FLAG_COLS:
        total = total + F.col(c)
    return total


@register("text_quality_gopher", oracle=_GOPHER_ORACLE)
def q_text_quality_gopher(spark: SparkSession, sf_dir: str):
    docs = table(spark, "documents", sf_dir)
    flags = gopher_doc_flags(docs)
    n_pass = F.sum(F.when(gopher_total_fails() == 0, 1).otherwise(0))
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_wc").cast("bigint").alias("fail_word_count"),
            F.sum("f_mwl").cast("bigint").alias("fail_mean_word_len"),
            F.sum("f_sym").cast("bigint").alias("fail_symbol_ratio"),
            F.sum("f_bullet").cast("bigint").alias("fail_bullet_lines"),
            F.sum("f_ellipsis").cast("bigint").alias("fail_ellipsis_lines"),
            F.sum("f_alpha").cast("bigint").alias("fail_alpha_words"),
            F.sum("f_stop").cast("bigint").alias("fail_stop_words"),
            n_pass.cast("bigint").alias("n_pass"),
            (
                F.floor(
                    n_pass * 100.0 / F.count(F.lit(1)) * 10000 + 0.5
                )
                / 10000
            ).alias("pass_pct"),
        )
        .orderBy("source")
    )


# -- int8 scalar-quantization recall audit --------------------------------------
# sim_pq_adc_recall answers "what does PQ cost"; this answers the same
# question for the simpler production alternative: per-dimension affine
# int8 codes (emb_quantize_int8's exact arithmetic) ranked by SYMMETRIC
# code-space L2, recall@10 against exact-L2 truth for 10 probe queries.
# Scale shape: dim stats are a 64-row broadcast; the probe code/dim
# frames are 10x64 broadcasts -- both rankings keep the corpus stream
# un-shuffled until the (query, vec) candidate rows hit the partitioned
# top-k windows. All distances are integers (code deltas / 1e-9-grid
# floats), so rankings are bit-identical across engines. Evaluation cost
# note (same as the ADC lane): the exact-truth side is the audit's
# price, not the serving path's.
_I8_NQ, _I8_TOPK, _I8_DIM = 10, 10, 64

_I8_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {_I8_DIM}
),
st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM ex GROUP BY dim),
codes AS (
  SELECT e.vec_id, e.dim,
         CAST(CASE WHEN st.mx = st.mn THEN 0
              ELSE floor((e.v - st.mn) / (st.mx - st.mn) * 255 + 0.5) - 128
              END AS BIGINT) AS code
  FROM ex e JOIN st USING (dim)
),
qd AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum((c.code - q.code) * (c.code - q.code)) AS qdist
  FROM codes c JOIN codes q ON q.dim = c.dim
  WHERE q.vec_id < {_I8_NQ} AND c.vec_id != q.vec_id
  GROUP BY 1, 2
),
int8_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY qdist, neighbor_id) AS rk
    FROM qd
  ) WHERE rk <= {_I8_TOPK}
),
exact AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         sum(CAST(floor((q.v - v.v) * (q.v - v.v) * 1e9 + 0.5) AS BIGINT))
           AS edist
  FROM ex q JOIN ex v ON v.dim = q.dim
  WHERE q.vec_id < {_I8_NQ} AND v.vec_id != q.vec_id
  GROUP BY 1, 2
),
exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY edist, neighbor_id) AS rk
    FROM exact
  ) WHERE rk <= {_I8_TOPK}
)
SELECT x.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_matched,
       floor(count(a.neighbor_id) * 1.0 / {_I8_TOPK} * 10000 + 0.5) / 10000
         AS recall_at_10
FROM exact_top x LEFT JOIN int8_top a
  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
GROUP BY 1 ORDER BY 1
"""


@register("sim_int8_recall", oracle=_I8_ORACLE)
def q_sim_int8_recall(spark: SparkSession, sf_dir: str):
    emb = table(spark, "embeddings", sf_dir).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == _I8_DIM)
    )
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "_vf")
    ).select("vec_id", "dim", F.col("_vf").cast("double").alias("v"))
    st = ex.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    code = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.floor(
                (F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255
                + F.lit(0.5)
            )
            - 128
        )
        .cast("long")
    )
    codes = ex.join(F.broadcast(st), "dim").select(
        "vec_id", "dim", code.alias("code")
    )
    qcodes = F.broadcast(
        codes.filter(F.col("vec_id") < _I8_NQ).select(
            F.col("vec_id").alias("query_id"),
            "dim",
            F.col("code").alias("qcode"),
        )
    )
    qd = (
        codes.join(qcodes, "dim")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.sum(
                (F.col("code") - F.col("qcode"))
                * (F.col("code") - F.col("qcode"))
            ).alias("qdist")
        )
    )
    wq = Window.partitionBy("query_id").orderBy("qdist", "neighbor_id")
    int8_top = (
        qd.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _I8_TOPK)
        .select("query_id", "neighbor_id")
    )
    qdims = F.broadcast(
        ex.filter(F.col("vec_id") < _I8_NQ).select(
            F.col("vec_id").alias("query_id"), "dim", F.col("v").alias("qv")
        )
    )
    exact = (
        ex.join(qdims, "dim")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.sum(
                F.floor(
                    (F.col("qv") - F.col("v"))
                    * (F.col("qv") - F.col("v"))
                    * 1e9
                    + 0.5
                ).cast("long")
            ).alias("edist")
        )
    )
    we = Window.partitionBy("query_id").orderBy("edist", "neighbor_id")
    exact_top = (
        exact.withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= _I8_TOPK)
        .select("query_id", "neighbor_id")
    )
    hit = F.broadcast(int8_top.withColumnRenamed("neighbor_id", "_hit"))
    return (
        exact_top.join(
            hit,
            (exact_top.query_id == hit.query_id)
            & (exact_top.neighbor_id == F.col("_hit")),
            "left",
        )
        .groupBy(exact_top.query_id)
        .agg(
            F.count("_hit").cast("bigint").alias("n_matched"),
            (
                F.floor(F.count("_hit") * 1.0 / _I8_TOPK * 10000 + 0.5) / 10000
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


# -- bloom-filter file-skipping simulation --------------------------------------
# layout_zonemap_pruning shows zone maps prune the SORTED layout to ~1
# file/probe -- and scan ~everything on the time-sorted layout, because
# every file's custkey [min, max] straddles the whole domain. Bloom
# filters are the production answer for exactly that case: point lookups
# on a column uncorrelated with sort order. Rows pack into the same 64
# time-sorted files; each file carries a bloom filter over its custkeys
# (m = 16384 bits, 3 universal-hash functions ((key*A_j + B_j) mod P)
# mod m -- explicit integer arithmetic so both engines compute identical
# bits); 20 evenly-spaced probe keys report files-by-truth, files-by-
# zonemap, files-by-bloom, and the bloom's false positives (bloom never
# misses: bloom >= truth by construction, pinned in tests). Scale: the
# per-file bit sets are (files x 3*keys-per-file)-bounded aggregates,
# the probe-side frames are 20x3 rows, and every join against them is a
# broadcast -- the fact table is scanned once per layout build, as in
# the zonemap lane.
_BF_FILES, _BF_PROBES, _BF_BITS = 64, 20, 16384
_BF_P = 2147483647
_BF_HASHES = (
    (2654435761, 1013904223),
    (2246822519, 374761393),
    (3266489917, 668265263),
)


def _bloom_oracle() -> str:
    bit_list = ", ".join(
        f"((o_custkey * {a} + {b}) % {_BF_P}) % {_BF_BITS}"
        for a, b in _BF_HASHES
    )
    probe_bits = "\n  UNION ALL\n".join(
        f"  SELECT p, {j} AS h, ((p * {a} + {b}) % {_BF_P}) % {_BF_BITS} AS bit"
        f" FROM probes"
        for j, (a, b) in enumerate(_BF_HASHES)
    )
    return f"""
WITH tiled AS (
  SELECT o_custkey,
         ntile({_BF_FILES}) OVER (ORDER BY o_orderdate, o_orderkey) AS f
  FROM orders
),
zones AS (
  SELECT f, min(o_custkey) AS zmin, max(o_custkey) AS zmax
  FROM tiled GROUP BY f
),
fbits AS (
  SELECT DISTINCT f, bit FROM (
    SELECT f, unnest([{bit_list}]) AS bit FROM tiled
  )
),
span AS (SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax FROM orders),
probes AS (
  SELECT cmin + CAST(floor(j * (cmax - cmin) / {_BF_PROBES - 1}) AS BIGINT)
           AS p
  FROM span, unnest(range(0, {_BF_PROBES})) r(j)
),
pbits AS (
{probe_bits}
),
bloom AS (
  SELECT pb.p, fb.f
  FROM pbits pb JOIN fbits fb ON fb.bit = pb.bit
  GROUP BY pb.p, fb.f
  HAVING count(DISTINCT pb.h) = {len(_BF_HASHES)}
),
truth AS (
  SELECT p.p, count(DISTINCT t.f) AS n_truth
  FROM probes p JOIN tiled t ON t.o_custkey = p.p GROUP BY 1
),
zhits AS (
  SELECT p.p, count(*) AS n_zone
  FROM probes p JOIN zones z ON p.p BETWEEN z.zmin AND z.zmax GROUP BY 1
),
bhits AS (SELECT p, count(*) AS n_bloom FROM bloom GROUP BY 1)
SELECT pr.p AS probe_key,
       CAST(coalesce(t.n_truth, 0) AS BIGINT) AS n_files_truth,
       CAST(coalesce(z.n_zone, 0) AS BIGINT) AS n_files_zonemap,
       CAST(coalesce(b.n_bloom, 0) AS BIGINT) AS n_files_bloom,
       CAST(coalesce(b.n_bloom, 0) - coalesce(t.n_truth, 0) AS BIGINT)
         AS n_false_pos
FROM probes pr
LEFT JOIN truth t ON t.p = pr.p
LEFT JOIN zhits z ON z.p = pr.p
LEFT JOIN bhits b ON b.p = pr.p
ORDER BY 1
"""


@register("layout_bloom_pruning", oracle=_bloom_oracle())
def q_layout_bloom_pruning(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        ntile_by_edges,
    )

    orders = table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    tiled = ntile_by_edges(
        orders, ["o_orderdate", "o_orderkey"], k=_BF_FILES, tile_col="f"
    ).select("f", "o_custkey")

    def bits(key):
        return [
            ((key * F.lit(a) + F.lit(b)) % _BF_P) % _BF_BITS
            for a, b in _BF_HASHES
        ]

    zones = tiled.groupBy("f").agg(
        F.min("o_custkey").alias("zmin"), F.max("o_custkey").alias("zmax")
    )
    fbits = tiled.select(
        "f", F.explode(F.array(*bits(F.col("o_custkey")))).alias("bit")
    ).distinct()
    span = orders.agg(
        F.min("o_custkey").alias("cmin"), F.max("o_custkey").alias("cmax")
    )
    probes = span.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_BF_PROBES - 1)),
                lambda j: F.col("cmin")
                + F.floor(
                    j * (F.col("cmax") - F.col("cmin")) / (_BF_PROBES - 1)
                ).cast("long"),
            )
        ).alias("p")
    )
    pbits = probes.select(
        "p",
        F.posexplode(F.array(*bits(F.col("p")))).alias("h", "bit"),
    )
    bloom = (
        F.broadcast(pbits)
        .join(fbits, "bit")
        .groupBy("p", "f")
        .agg(F.count_distinct("h").alias("nh"))
        .filter(F.col("nh") == len(_BF_HASHES))
    )
    truth = (
        F.broadcast(probes)
        .join(tiled, probes.p == tiled.o_custkey)
        .groupBy("p")
        .agg(F.count_distinct("f").alias("n_truth"))
    )
    zhits = (
        F.broadcast(probes)
        .join(
            zones,
            (F.col("p") >= F.col("zmin")) & (F.col("p") <= F.col("zmax")),
        )
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_zone"))
    )
    bhits = bloom.groupBy("p").agg(F.count(F.lit(1)).alias("n_bloom"))
    out = (
        probes.join(truth, "p", "left")
        .join(zhits, "p", "left")
        .join(bhits, "p", "left")
        .select(
            F.col("p").alias("probe_key"),
            F.coalesce("n_truth", F.lit(0)).cast("bigint").alias(
                "n_files_truth"
            ),
            F.coalesce("n_zone", F.lit(0)).cast("bigint").alias(
                "n_files_zonemap"
            ),
            F.coalesce("n_bloom", F.lit(0)).cast("bigint").alias(
                "n_files_bloom"
            ),
            (F.coalesce("n_bloom", F.lit(0)) - F.coalesce("n_truth", F.lit(0)))
            .cast("bigint")
            .alias("n_false_pos"),
        )
        .orderBy("probe_key")
    )
    return out


# -- mergeable KMV distinct-count sketch (bottom-k hashes) ---------------------
# The second mergeable distinct sketch beside rel_hll_mergeable, with a
# property HLL lacks: it is EXACTLY engine-replayable (the state is the k
# smallest md5 fractions of the key set, deterministic to the bit), so
# the incremental contract gets a full hash-match oracle instead of an
# error-envelope boolean. State = bottom-16 hashes of distinct users per
# event_type from the OLD half; the batch contributes its own bottom-16;
# the merge dedups the union (same user -> same hash) and re-ranks 2k
# rows per group -- never the corpus. Estimate = (k-1)/h_k, the standard
# KMV estimator, alongside the exact distinct count and relative error
# (the number a practitioner reads before trusting the sketch at 100 TB,
# where the exact count is the thing you can no longer afford). Windows
# are rank-truncating (WindowGroupLimit) over DISTINCT-user frames.
_KMV_K = 16

_KMV_H_SQL = (
    "(CAST('0x' || substr(md5('kmv' || chr(31) || CAST(user_id AS VARCHAR)),"
    " 1, 8) AS UBIGINT) + 0.5) / 4294967296.0"
)

_KMV_ORACLE = f"""
WITH ev AS (
  SELECT event_type, user_id, ts::TIMESTAMP AS t FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
du_old AS (SELECT DISTINCT event_type, user_id FROM ev
           WHERE t < TIMESTAMP '{_QCUT}'),
du_new AS (SELECT DISTINCT event_type, user_id FROM ev
           WHERE t >= TIMESTAMP '{_QCUT}'),
bk_old AS (
  SELECT event_type, user_id, h FROM (
    SELECT event_type, user_id, {_KMV_H_SQL} AS h,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY {_KMV_H_SQL}, user_id) AS rn
    FROM du_old
  ) WHERE rn <= {_KMV_K}
),
bk_new AS (
  SELECT event_type, user_id, h FROM (
    SELECT event_type, user_id, {_KMV_H_SQL} AS h,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY {_KMV_H_SQL}, user_id) AS rn
    FROM du_new
  ) WHERE rn <= {_KMV_K}
),
merged AS (
  SELECT DISTINCT event_type, user_id, h FROM (
    SELECT * FROM bk_old UNION ALL SELECT * FROM bk_new
  )
),
state AS (
  SELECT event_type, user_id, h FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY h, user_id) AS rn
    FROM merged
  ) WHERE rn <= {_KMV_K}
),
est AS (
  SELECT event_type, count(*) AS n_state, max(h) AS hmax
  FROM state GROUP BY 1
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM ev GROUP BY 1
)
SELECT x.event_type,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       CAST(e.n_state AS BIGINT) AS n_state,
       floor((CASE WHEN e.n_state >= {_KMV_K}
                   THEN ({_KMV_K} - 1) / e.hmax
                   ELSE e.n_state * 1.0 END) * 10000 + 0.5) / 10000
         AS kmv_estimate,
       floor(abs((CASE WHEN e.n_state >= {_KMV_K}
                       THEN ({_KMV_K} - 1) / e.hmax
                       ELSE e.n_state * 1.0 END) - x.n_exact)
             / x.n_exact * 10000 + 0.5) / 10000 AS rel_err
FROM est e JOIN exact x USING (event_type) ORDER BY 1
"""


@register("inc_kmv_distinct_merge", oracle=_KMV_ORACLE)
def q_inc_kmv_distinct_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.hashing import (
        stable_hash,
    )

    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", "user_id", "ts")
    )
    cut = F.lit(_QCUT).cast("timestamp")
    h = (
        F.conv(
            F.substring(stable_hash(F.lit("kmv"), F.col("user_id")), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / float(16**8)
    w = Window.partitionBy("event_type").orderBy("h", "user_id")

    def bottomk(half):
        return (
            half.select("event_type", "user_id")
            .distinct()
            .withColumn("h", h)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _KMV_K)
            .drop("rn")
        )

    # yesterday's persisted sketch + the batch's own sketch, merged by
    # dedup (same key -> same hash) + re-rank of <= 2k rows per group
    merged = (
        bottomk(ev.filter(F.col("ts") < cut))
        .unionByName(bottomk(ev.filter(F.col("ts") >= cut)))
        .dropDuplicates(["event_type", "user_id"])
    )
    state = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn")
    )
    est_raw = F.when(
        F.col("n_state") >= _KMV_K, (_KMV_K - 1) / F.col("hmax")
    ).otherwise(F.col("n_state") * 1.0)
    est = state.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_state"), F.max("h").alias("hmax")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000  # noqa: E731
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_state").cast("bigint").alias("n_state"),
            r4(est_raw).alias("kmv_estimate"),
            r4(F.abs(est_raw - F.col("n_exact")) / F.col("n_exact")).alias(
                "rel_err"
            ),
        )
        .orderBy("event_type")
    )


# -- streaming grid-quantile maintenance ---------------------------------------
# stream_topk_merge folds the mergeable TOP-K contract through Structured
# Streaming; this folds the mergeable QUANTILE contract (the
# inc_quantile_merge histogram algebra). Events arrive as 4 micro-batches
# in WHATEVER order the engine picks -- safe, because cell-wise histogram
# addition is order-invariant AND replay-idempotent (state lands per
# batch_id, the stream_upsert_replay_state convention). The drained state
# is (group, bin) counts -- value-range-bounded, never row-count-bounded
# -- and the discrete quantiles read off its cumulative exactly as the
# scratch oracle computes them over the full table.
_SQM_ORACLE = f"""
WITH ev AS (
  SELECT event_type, floor(CAST(value AS DOUBLE) * 100 + 0.5) / 100 AS bin
  FROM {EVENTS_SRC} WHERE value IS NOT NULL AND ts IS NOT NULL
),
bins AS (SELECT event_type, bin, count(*) AS c FROM ev GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cm,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM bins
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_rows,
       min(CASE WHEN cm >= ceil(n * 0.25) THEN bin END) AS q25,
       min(CASE WHEN cm >= ceil(n * 0.5) THEN bin END) AS median,
       min(CASE WHEN cm >= ceil(n * 0.9) THEN bin END) AS q90,
       min(CASE WHEN cm >= ceil(n * 0.99) THEN bin END) AS q99
FROM cum GROUP BY 1 ORDER BY 1
"""


@register("stream_quantile_merge", oracle=_SQM_ORACLE)
def q_stream_quantile_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        fold_stream_state,
    )

    d = (
        table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            (F.floor(F.col("value").cast("double") * 100 + 0.5) / 100).alias(
                "bin"
            ),
        )
    )

    def fold(prev, batch):
        hist = batch.groupBy("event_type", "bin").agg(
            F.count(F.lit(1)).alias("c")
        )
        if prev is None:
            return hist
        return (
            prev.unionByName(hist)
            .groupBy("event_type", "bin")
            .agg(F.sum("c").alias("c"))
        )

    def finalize(bins):
        w_cum = (
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_all = Window.partitionBy("event_type")
        cum = bins.select(
            "event_type",
            "bin",
            F.sum("c").over(w_cum).alias("cm"),
            F.sum("c").over(w_all).alias("n"),
        )

        def _q(p):
            return F.min(
                F.when(F.col("cm") >= F.ceil(F.col("n") * p), F.col("bin"))
            )

        return (
            cum.groupBy("event_type")
            .agg(
                F.max("n").cast("bigint").alias("n_rows"),
                _q(0.25).alias("q25"),
                _q(0.5).alias("median"),
                _q(0.9).alias("q90"),
                _q(0.99).alias("q99"),
            )
            .orderBy("event_type")
        )

    return fold_stream_state(spark, d, fold, finalize)


# -- incremental ridge-model maintenance (mergeable moments) -------------------
# The inc_* contract applied to MODEL FITTING: a least-squares/ridge fit
# is a function of five moment sums (n, Sx, Sxx, Sxy, Sy), and moments
# are mergeable -- so the maintained state is O(1) per group (the old
# half's moments plus its LAST observation), and a batch folds in as
# batch-internal pair moments + ONE boundary pair (state.last ->
# batch.first) + cell-wise addition. No old event is ever re-read; the
# refreshed model is hash-proven equal (same closed-form 2x2 ridge as
# ml_ridge_lag1_parity) to a scratch fit over ALL consecutive pairs,
# which is what the oracle computes. This is how a 100 TB forecaster
# refreshes nightly without re-scanning history.
_IRM_ALPHA = 1.0


def _irm_oracle() -> str:
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
        portable_round_sql,
    )

    return f"""
WITH ev AS (
  SELECT event_type AS respondent, ts::TIMESTAMP AS period, event_id,
         CAST(value AS DOUBLE) AS value
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
o AS (
  SELECT respondent, value AS x,
         lead(value) OVER (PARTITION BY respondent
                           ORDER BY period, event_id) AS y
  FROM ev
),
-- moments on the exact-decimal grid (ADVICE r8, closed r10): the fixture
-- values are 2-decimal, so DECIMAL(18,2) sums of decimal products are
-- EXACT and association-order free -- no partial-sum ordering on either
-- engine can flip the 4-decimal rounding boundary. One final cast to
-- double per moment, then identical IEEE ops compute the closed form.
p AS (
  SELECT respondent, CAST(x AS DECIMAL(18,2)) AS x,
         CAST(y AS DECIMAL(18,2)) AS y
  FROM o WHERE y IS NOT NULL
),
m AS (
  SELECT respondent, count(*) AS n,
         CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(x * y) AS DOUBLE) AS sxy, CAST(sum(y) AS DOUBLE) AS sy
  FROM p GROUP BY 1
)
SELECT respondent,
       CAST(n AS BIGINT) AS n_pairs,
       {portable_round_sql(
           f"((n + {_IRM_ALPHA}) * sxy - sx * sy)"
           f" / ((sxx + {_IRM_ALPHA}) * (n + {_IRM_ALPHA}) - sx * sx)", 4)}
         AS slope,
       {portable_round_sql(
           f"((sxx + {_IRM_ALPHA}) * sy - sx * sxy)"
           f" / ((sxx + {_IRM_ALPHA}) * (n + {_IRM_ALPHA}) - sx * sx)", 2)}
         AS intercept
FROM m ORDER BY 1
"""


@register("inc_ridge_moments_merge", oracle=_irm_oracle())
def q_inc_ridge_moments_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
        portable_round,
    )

    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("respondent"),
            "ts",
            "event_id",
            F.col("value").cast("double").alias("value"),
        )
    )
    cut = F.lit(_QCUT).cast("timestamp")
    old, new = ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)

    def internal_pairs(half):
        w = Window.partitionBy("respondent").orderBy("ts", "event_id")
        return (
            half.withColumn("y", F.lead("value").over(w))
            .filter(F.col("y").isNotNull())
            .select("respondent", F.col("value").alias("x"), "y")
        )

    def edge(half, last: bool):
        w = Window.partitionBy("respondent").orderBy(
            *(
                [F.desc("ts"), F.desc("event_id")]
                if last
                else [F.asc("ts"), F.asc("event_id")]
            )
        )
        return (
            half.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("respondent", "value")
        )

    # the ONE cross-boundary pair per group: state's last -> batch's first
    boundary = (
        edge(old, last=True)
        .withColumnRenamed("value", "x")
        .join(edge(new, last=False).withColumnRenamed("value", "y"), "respondent")
    )

    def moments(pairs):
        # exact-decimal moment grid (ADVICE r8, closed r10): 2-decimal
        # fixture values cast to DECIMAL(18,2) make every sum exact and
        # association-order free -- the state can be merged in ANY order
        # (cell-wise, batch-wise, tree-wise) without the 4-decimal rounding
        # of the closed form ever seeing a partial-sum reorder. Mirrors the
        # oracle's DECIMAL CTE exactly.
        xd, yd = F.col("x").cast("decimal(18,2)"), F.col("y").cast("decimal(18,2)")
        return pairs.groupBy("respondent").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(xd).alias("sx"),
            F.sum(xd * yd).alias("sxy"),
            F.sum(yd).alias("sy"),
        )

    # yesterday's persisted moment state + the batch's own moments + the
    # boundary pair, merged CELL-WISE (never re-reading old events);
    # decimal sums of decimal partials stay exact
    merged = (
        moments(internal_pairs(old))
        .unionByName(moments(internal_pairs(new)))
        .unionByName(moments(boundary))
        .groupBy("respondent")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sxx").cast("double").alias("sxx"),
            F.sum("sx").cast("double").alias("sx"),
            F.sum("sxy").cast("double").alias("sxy"),
            F.sum("sy").cast("double").alias("sy"),
        )
    )
    det = (F.col("sxx") + _IRM_ALPHA) * (F.col("n") + _IRM_ALPHA) - F.col(
        "sx"
    ) * F.col("sx")
    slope = ((F.col("n") + _IRM_ALPHA) * F.col("sxy") - F.col("sx") * F.col("sy")) / det
    intercept = (
        (F.col("sxx") + _IRM_ALPHA) * F.col("sy") - F.col("sx") * F.col("sxy")
    ) / det
    return merged.select(
        "respondent",
        F.col("n").cast("bigint").alias("n_pairs"),
        portable_round(slope, 4).alias("slope"),
        portable_round(intercept, 2).alias("intercept"),
    ).orderBy("respondent")


# -- snapshot diff (CDC-style version reconciliation) --------------------------
# The lakehouse audit the tombstone/merge family was missing: given two
# versions of a table, classify every key as added / removed / changed /
# unchanged -- the change-data-feed a replication pipeline validates
# against. Versions derive deterministically from the one fixture on
# BOTH engines (A drops event_id % 13 = 3 "later inserts"; B drops
# event_id % 17 = 5 "deletes" and perturbs value where event_id % 7 = 2
# "updates"), so the classification is fully oracle-replayable. Shape:
# ONE full-outer equi-join on the key (AQE-skew-splittable) feeding a
# group-count-sized aggregate; change detection is null-safe so
# null-valued rows compare as unchanged.
_DIFF_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
  FROM {EVENTS_SRC}
),
a AS (SELECT * FROM base WHERE event_id % 13 != 3),
b AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 7 = 2 THEN value * 1.1 ELSE value END AS value
  FROM base WHERE event_id % 17 != 5
),
d AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type,
         CASE WHEN a.event_id IS NULL THEN 'added'
              WHEN b.event_id IS NULL THEN 'removed'
              WHEN a.value IS NOT DISTINCT FROM b.value THEN 'unchanged'
              ELSE 'changed' END AS kind
  FROM a FULL OUTER JOIN b ON b.event_id = a.event_id
)
SELECT event_type,
       CAST(sum(CASE WHEN kind = 'added' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_added,
       CAST(sum(CASE WHEN kind = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(sum(CASE WHEN kind = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(sum(CASE WHEN kind = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unchanged
FROM d GROUP BY 1 ORDER BY 1
"""


@register("val_snapshot_diff", oracle=_DIFF_ORACLE)
def q_val_snapshot_diff(spark: SparkSession, sf_dir: str):
    base = table(spark, "events", sf_dir).select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    a = base.filter(F.col("event_id") % 13 != 3).select(
        F.col("event_id").alias("a_id"),
        F.col("event_type").alias("a_type"),
        F.col("value").alias("a_value"),
    )
    b = base.filter(F.col("event_id") % 17 != 5).select(
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("b_type"),
        F.when(F.col("event_id") % 7 == 2, F.col("value") * 1.1)
        .otherwise(F.col("value"))
        .alias("b_value"),
    )
    d = a.join(b, a.a_id == b.b_id, "full_outer").select(
        F.coalesce("a_type", "b_type").alias("event_type"),
        F.when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("b_id").isNull(), F.lit("removed"))
        .when(F.col("a_value").eqNullSafe(F.col("b_value")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("kind"),
    )
    cnt = lambda k: F.sum(F.when(F.col("kind") == k, 1).otherwise(0)).cast(  # noqa: E731
        "bigint"
    )
    return (
        d.groupBy("event_type")
        .agg(
            cnt("added").alias("n_added"),
            cnt("removed").alias("n_removed"),
            cnt("changed").alias("n_changed"),
            cnt("unchanged").alias("n_unchanged"),
        )
        .orderBy("event_type")
    )


# -- span-dedup impact (the Lee-et-al headline number) --------------------------
# text_span_dedup reports WHERE the repeated spans are (bounded payload);
# this reports HOW MUCH an exact-substring dedup would remove, corpus-
# wide: per source, the fraction of tokens covered by >= 1 cross-document
# duplicated 5-gram. Coverage is a token-position UNION (each duplicated
# gram start covers positions i..i+4; overlapping islands must not double
# count), computed as explode(5 offsets) -> distinct -- the duplicated-
# position stream is gram-bounded, never corpus^2. Aggregate output (20
# sources), so no doc_id cap: this is the number that decides whether to
# run span-level dedup on the corpus at all.
_SPAN_IMPACT_ORACLE = f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
pos AS (
  SELECT doc_id, CAST(i AS INTEGER) AS i,
         array_to_string(t[i:i+{_SPAN_K - 1}], ' ') AS g
  FROM toks, unnest(range(1, len(t) - {_SPAN_K - 2})) r(i)
  WHERE len(t) >= {_SPAN_K}
),
df AS (SELECT g FROM pos GROUP BY g
       HAVING count(DISTINCT doc_id) >= {_SPAN_DF}),
cover AS (
  SELECT DISTINCT p.doc_id, CAST(j AS INTEGER) AS j
  FROM pos p JOIN df USING (g),
       unnest(range(p.i, p.i + {_SPAN_K})) r(j)
),
per_doc AS (SELECT doc_id, count(*) AS dup_toks FROM cover GROUP BY 1)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(t.t)) AS BIGINT) AS total_tokens,
       CAST(sum(coalesce(p.dup_toks, 0)) AS BIGINT) AS dup_tokens,
       floor(sum(coalesce(p.dup_toks, 0)) * 1.0
             / greatest(sum(len(t.t)), 1) * 10000 + 0.5) / 10000 AS dup_pct
FROM toks t LEFT JOIN per_doc p USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


@register("text_span_dedup_impact", oracle=_SPAN_IMPACT_ORACLE)
def q_text_span_dedup_impact(spark: SparkSession, sf_dir: str):
    docs = table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", "source", TX.tokens("text").alias("t"))
    pos, dfreq = _span_gram_positions(toks)
    cover = (
        pos.join(dfreq, "g")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (_SPAN_K - 1))
            ).alias("j"),
        )
        .distinct()
    )
    per_doc = cover.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dup_toks"))
    return (
        toks.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size("t")).cast("bigint").alias("total_tokens"),
            F.sum(F.coalesce("dup_toks", F.lit(0))).cast("bigint").alias(
                "dup_tokens"
            ),
            (
                F.floor(
                    F.sum(F.coalesce("dup_toks", F.lit(0)))
                    * 1.0
                    / F.greatest(F.sum(F.size("t")), F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("dup_pct"),
        )
        .orderBy("source")
    )


# -- personalized PageRank (seed-restart ranking) -------------------------------
# graph_pagerank ranks globally; recommendation/similarity serving needs
# the PERSONALIZED variant: all teleport mass (and dangling mass)
# restarts at one seed node, so ranks measure proximity TO THE SEED.
# Same determinism design as graph_pagerank: every quantity on a
# fixed-point integer grid (weights 1e6, ranks 1e9, per-term integer
# division before summation -- integer sums are associative, so Spark is
# bit-identical to the oracle's unrolled CTE iterations regardless of
# partitioning). Seed = the lexicographically smallest node, derived as
# a 1-row frame (crossJoin), never a collect. Same scale story: one
# events-sized pass builds the edge list; iterations touch node/edge-
# sized tables only, lineage capped per iteration.
_PPR_ITERS = 3


def _ppr_oracle() -> str:
    from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.graph import (
        _D_DEN,
        _D_NUM,
        _P_SCALE,
        _R_SCALE,
    )

    parts = [
        f"""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM {EVENTS_SRC}
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
edges AS (
  SELECT a.event_type AS u, b.event_type AS v, count(*) AS c
  FROM seq a JOIN seq b ON b.user_id = a.user_id AND b.rn = a.rn + 1
  GROUP BY 1, 2
),
outdeg AS (SELECT u, sum(c) AS tot FROM edges GROUP BY 1),
w AS (
  SELECT e.u, e.v, (e.c * {_P_SCALE}) // o.tot AS p_fp
  FROM edges e JOIN outdeg o ON o.u = e.u
),
nodes AS (
  SELECT u AS node FROM edges UNION SELECT v FROM edges
),
seed AS (SELECT min(node) AS s FROM nodes),
r0 AS MATERIALIZED (
  SELECT node, CASE WHEN node = (SELECT s FROM seed)
               THEN CAST({_R_SCALE} AS BIGINT) ELSE 0 END AS r_fp
  FROM nodes
)"""
    ]
    for i in range(1, _PPR_ITERS + 1):
        parts.append(
            f""",
inflow{i} AS MATERIALIZED (
  SELECT w.v AS node, sum((w.p_fp * r.r_fp) // {_P_SCALE}) AS s
  FROM w JOIN r{i - 1} r ON r.node = w.u GROUP BY 1
),
dang{i} AS MATERIALIZED (
  SELECT coalesce(sum(r.r_fp), 0) AS m
  FROM r{i - 1} r LEFT JOIN outdeg o ON o.u = r.node WHERE o.u IS NULL
),
r{i} AS MATERIALIZED (
  SELECT n.node,
         (CASE WHEN n.node = (SELECT s FROM seed)
               THEN ({(_D_DEN - _D_NUM) * _R_SCALE}) // {_D_DEN}
               ELSE 0 END)
         + ({_D_NUM} * (coalesce(f.s, 0)
             + CASE WHEN n.node = (SELECT s FROM seed) THEN d.m ELSE 0 END))
           // {_D_DEN} AS r_fp
  FROM nodes n CROSS JOIN dang{i} d
  LEFT JOIN inflow{i} f ON f.node = n.node
)"""
        )
    parts.append(
        f"""
SELECT node,
       (SELECT s FROM seed) AS seed,
       CAST(r_fp AS BIGINT) AS ppr_fp,
       floor(r_fp * 1.0 / 1000 + 0.5) / 1000000 AS ppr
FROM r{_PPR_ITERS}
ORDER BY node
"""
    )
    return "".join(parts)


@register("graph_ppr_unrolled", oracle=_ppr_oracle())
def q_graph_ppr_unrolled(spark: SparkSession, sf_dir: str):
    import os

    from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.graph import (
        _D_DEN,
        _D_NUM,
        _P_SCALE,
        _R_SCALE,
    )

    scoped = os.environ.get("SPARK_GRAFT_SCOPED_CACHE", "1") != "0"
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("v", F.lead("event_type").over(wseq))
        .filter(F.col("v").isNotNull())
        .groupBy(F.col("event_type").alias("u"), "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if scoped:
        edges = edges.persist()
    outdeg = edges.groupBy("u").agg(F.sum("c").alias("tot"))
    w = edges.join(outdeg, "u").select(
        "u", "v", F.expr(f"(c * {_P_SCALE}) div tot").alias("p_fp")
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    seed = nodes.agg(F.min("node").alias("s"))
    dangling = nodes.join(outdeg, nodes.node == outdeg.u, "left_anti")
    ranks = nodes.crossJoin(F.broadcast(seed)).select(
        "node",
        F.when(F.col("node") == F.col("s"), F.lit(_R_SCALE).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("r_fp"),
    )
    for _ in range(_PPR_ITERS):
        if scoped:
            ranks = ranks.localCheckpoint(eager=True)
        inflow = (
            w.join(ranks, w.u == ranks.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.expr(f"(p_fp * r_fp) div {_P_SCALE}")).alias("infl"))
        )
        dang = ranks.join(dangling, "node", "left_semi").agg(
            F.coalesce(F.sum("r_fp"), F.lit(0)).alias("m")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(seed))
            .crossJoin(F.broadcast(dang))
            .join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.when(
                        F.col("node") == F.col("s"),
                        F.lit(((_D_DEN - _D_NUM) * _R_SCALE) // _D_DEN).cast(
                            "long"
                        ),
                    ).otherwise(F.lit(0).cast("long"))
                    + F.expr(
                        f"({_D_NUM} * (coalesce(infl, CAST(0 AS BIGINT))"
                        f" + CASE WHEN node = s THEN m"
                        f" ELSE CAST(0 AS BIGINT) END)) div {_D_DEN}"
                    )
                ).alias("r_fp"),
            )
        )
    out = ranks.crossJoin(F.broadcast(seed.withColumnRenamed("s", "seed"))).select(
        "node",
        "seed",
        F.col("r_fp").alias("ppr_fp"),
        (F.floor(F.col("r_fp") * 1.0 / 1000 + 0.5) / 1000000).alias("ppr"),
    ).orderBy("node")
    if scoped:
        out = out.localCheckpoint(eager=True)
        edges.unpersist()
    return out


# -- coincidence / diversity factor (power-systems aggregation metric) --------
# The electricity-domain number the reference's forecasting pipeline
# implicitly depends on: the system peak is LESS than the sum of the
# per-unit peaks because units don't peak together. coincidence factor =
# system peak / sum(unit peaks) in (0, 1]; diversity factor = its
# reciprocal. Units = event types, hourly DECIMAL load sums (exact,
# order-independent), peaks = max over hours. Two shuffles ((unit, hour)
# agg, then unit- and hour-level maxes over hour-count-sized frames);
# ratios computed once on doubles, rounded at the edge.
_CF_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS h,
         sum(CAST(value AS DECIMAL(18,2))) AS load
  FROM {EVENTS_SRC} WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
unit_peaks AS (
  SELECT event_type, max(load) AS unit_peak FROM hourly GROUP BY 1
),
system_hourly AS (SELECT h, sum(load) AS sys_load FROM hourly GROUP BY 1),
agg AS (
  SELECT (SELECT count(*) FROM unit_peaks) AS n_units,
         (SELECT CAST(sum(unit_peak) AS DOUBLE) FROM unit_peaks)
           AS sum_unit_peaks,
         (SELECT CAST(max(sys_load) AS DOUBLE) FROM system_hourly)
           AS system_peak
)
SELECT CAST(n_units AS BIGINT) AS n_units,
       floor(sum_unit_peaks * 100 + 0.5) / 100 AS sum_unit_peaks,
       floor(system_peak * 100 + 0.5) / 100 AS system_peak,
       floor(system_peak / sum_unit_peaks * 10000 + 0.5) / 10000
         AS coincidence_factor,
       floor(sum_unit_peaks / system_peak * 10000 + 0.5) / 10000
         AS diversity_factor
FROM agg
"""


@register("ts_coincidence_factor", oracle=_CF_ORACLE)
def q_ts_coincidence_factor(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_trunc("hour", "ts").alias("h"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    hourly = ev.groupBy("event_type", "h").agg(F.sum("v").alias("load"))
    unit_peaks = hourly.groupBy("event_type").agg(F.max("load").alias("unit_peak"))
    up = unit_peaks.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("unit_peak").cast("double").alias("sum_unit_peaks"),
    )
    sys_peak = (
        hourly.groupBy("h")
        .agg(F.sum("load").alias("sys_load"))
        .agg(F.max("sys_load").cast("double").alias("system_peak"))
    )
    r2 = lambda c: F.floor(c * 100 + 0.5) / 100  # noqa: E731
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000  # noqa: E731
    return up.crossJoin(F.broadcast(sys_peak)).select(
        F.col("n_units").cast("bigint").alias("n_units"),
        r2(F.col("sum_unit_peaks")).alias("sum_unit_peaks"),
        r2(F.col("system_peak")).alias("system_peak"),
        r4(F.col("system_peak") / F.col("sum_unit_peaks")).alias(
            "coincidence_factor"
        ),
        r4(F.col("sum_unit_peaks") / F.col("system_peak")).alias(
            "diversity_factor"
        ),
    )


# -- streaming KMV fold (the third mergeable state shape on the engine) --------
# stream_topk_merge (order statistics) and stream_quantile_merge
# (distributions) proved their batch merge contracts through Structured
# Streaming; this completes the trilogy with DISTINCT COUNTS: the KMV
# bottom-k sketch folds per micro-batch (batch's own bottom-k -> dedup
# union with landed state -> re-rank, k rows/group state, idempotent
# per-batch_id overwrite). Bottom-k of a set union is order-invariant
# and replay-idempotent -- the drained sketch equals the global scratch
# bottom-k whatever file order the engine picked. The oracle is the
# GLOBAL scratch derivation (not a split replay), so the hash match
# proves fold == scratch independently of how the stream was cut.
_SKMV_ORACLE = f"""
WITH ev AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
h AS (
  SELECT event_type, user_id, {_KMV_H_SQL} AS h FROM ev
),
state AS (
  SELECT event_type, user_id, h FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY h, user_id) AS rn
    FROM h
  ) WHERE rn <= {_KMV_K}
),
est AS (
  SELECT event_type, count(*) AS n_state, max(h) AS hmax
  FROM state GROUP BY 1
),
exact AS (
  SELECT event_type, count(*) AS n_exact FROM ev GROUP BY 1
)
SELECT x.event_type,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       CAST(e.n_state AS BIGINT) AS n_state,
       floor((CASE WHEN e.n_state >= {_KMV_K}
                   THEN ({_KMV_K} - 1) / e.hmax
                   ELSE e.n_state * 1.0 END) * 10000 + 0.5) / 10000
         AS kmv_estimate
FROM est e JOIN exact x USING (event_type) ORDER BY 1
"""


@register("stream_kmv_merge", oracle=_SKMV_ORACLE)
def q_stream_kmv_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.hashing import (
        stable_hash,
    )
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        fold_stream_state,
    )

    d = (
        table(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", "user_id")
    )
    h = (
        F.conv(
            F.substring(stable_hash(F.lit("kmv"), F.col("user_id")), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / float(16**8)
    w = Window.partitionBy("event_type").orderBy("h", "user_id")

    def bottomk(df):
        return (
            df.select("event_type", "user_id")
            .distinct()
            .withColumn("h", h)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _KMV_K)
            .drop("rn")
        )

    def fold(prev, batch):
        m = bottomk(batch)
        if prev is None:
            return m
        return bottomk(
            prev.select("event_type", "user_id").unionByName(
                m.select("event_type", "user_id")
            )
        )

    def finalize(state):
        est = state.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_state"), F.max("h").alias("hmax")
        )
        exact = d.distinct().groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_exact")
        )
        est_raw = F.when(
            F.col("n_state") >= _KMV_K, (_KMV_K - 1) / F.col("hmax")
        ).otherwise(F.col("n_state") * 1.0)
        return (
            est.join(exact, "event_type")
            .select(
                "event_type",
                F.col("n_exact").cast("bigint").alias("n_exact"),
                F.col("n_state").cast("bigint").alias("n_state"),
                (F.floor(est_raw * 10000 + 0.5) / 10000).alias("kmv_estimate"),
            )
            .orderBy("event_type")
        )

    return fold_stream_state(spark, d, fold, finalize)
