"""Count-min sketch: mergeable frequency summaries with bounded memory.

The companion to Misra-Gries (operators/heavyhitters.py): MG answers
"which keys exceed a share threshold" exactly; CMS answers "what is this
key's approximate count" for ANY key with a fixed depth x width budget
(Cormode & Muthukrishnan, J. Algorithms 2005). Estimates NEVER
under-count (each cell is a sum over a superset of the key's
occurrences) and over-count by at most eps*N with probability 1-delta
(eps = e/width, delta = e^-depth).

Distribution shape (the point at 100 TB): each input partition folds its
tokens into a LOCAL depth x width integer grid via ``mapInPandas`` --
emitting at most depth*width (j, bucket, cnt) rows per partition, never
data-sized -- and the global sketch is the cell-wise SUM of the locals
(CMS is a linear sketch, so merge == add). The only shuffle is bounded
by n_partitions x depth x width.

Hashing is engine-portable BY CONSTRUCTION so an independent engine can
rebuild the identical sketch: bucket_j(t) = int(md5(f"{j}:{t}")[:8
hex], 16) % width. Python computes it with hashlib (build side);
Spark's JVM expressions compute it as conv(substr(md5(..), 1, 8), 16,
10) (estimate side); DuckDB as CAST('0x' || substr(md5(..), 1, 8) AS
BIGINT) (the oracle on `text_cms_freq_est` rebuilds the whole sketch in
SQL and must land on the exact same cells).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_py(j: int, token: str, width: int) -> int:
    return int(hashlib.md5(f"{j}:{token}".encode()).hexdigest()[:8], 16) % width


def _bucket_expr(j: Column, token: Column, width: int) -> Column:
    """The identical hash as a JVM-side expression (codegen, no UDF)."""
    h = F.md5(F.concat(j.cast("string"), F.lit(":"), token))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_build_exprs(
    token_df: DataFrame, token_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Pure-JVM alternative build: explode the depth rows per token
    (codegen md5/conv bucket hash) and hash-aggregate; map-side combine
    collapses each partition to <= depth*width cells before the shuffle,
    the same bound as the local-grid pass. Tradeoff vs :func:`cms_build`:
    this path hashes rows x depth in codegen and never crosses into
    Python; the local-grid pass hashes only DISTINCT-tokens x depth
    (vocabulary-aware) but ships the token column through Arrow. Measured
    on the fixture corpus (tiny vocabulary, many rows) the local grids
    win 3x; on vocabulary-heavy shards the expression path wins. A test
    pins both bit-identical — CMS is linear, so any mix merges."""
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth/width must be positive: {depth}x{width}")
    rows = token_df.filter(F.col(token_col).isNotNull()).select(
        F.col(token_col).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    return (
        rows.select("j", _bucket_expr(F.col("j"), F.col("tok"), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_build(
    token_df: DataFrame, token_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Default build — the mergeable-summaries formulation: per-partition
    local depth x width grids (mapInPandas, <= depth*width rows each)
    summed cell-wise. Per-partition cost is value_counts (C speed) plus
    md5 over DISTINCT tokens x depth only. See :func:`cms_build_exprs`
    for the zero-Python alternative and the measured tradeoff."""
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth/width must be positive: {depth}x{width}")

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cells: dict[tuple[int, int], int] = {}
        for pdf in batches:
            for token, c in pdf[token_col].dropna().value_counts().items():
                for j in range(depth):
                    key = (j, _bucket_py(j, token, width))
                    cells[key] = cells.get(key, 0) + int(c)
        yield pd.DataFrame(
            {
                "j": pd.array([k[0] for k in cells], dtype="int32"),
                "bucket": pd.array([k[1] for k in cells], dtype="int64"),
                "cnt": pd.array(list(cells.values()), dtype="int64"),
            }
        )

    local = token_df.select(F.col(token_col)).mapInPandas(
        sketch, schema="j int, bucket long, cnt long"
    )
    return local.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for every probe token: min over rows j of the
    matching cell. Probe hashing runs JVM-side (codegen md5/conv); the
    sketch side of the join is depth*width rows at most, so Spark
    broadcasts it. Missing cells are zero (token never seen)."""
    probe_rows = probes.select(token_col).distinct().select(
        token_col, F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    probe_rows = probe_rows.withColumn(
        "bucket", _bucket_expr(F.col("j"), F.col(token_col), width)
    )
    return (
        probe_rows.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(token_col)
        .agg(F.min("cnt").alias("cms_est"))
    )
