"""Input-parallelism repair for compute-bound operators.

A parquet file is split at ROW-GROUP granularity: a table written as one
row group arrives as ONE scan partition no matter how small
``spark.sql.files.maxPartitionBytes`` is, so every map-side operator
downstream of that scan runs single-threaded (guide §2.5 "input skew:
one huge unsplittable file"). The fixture tables here are all single
row-group files, which serialized the whole per-document compute of the
text/dedup/similarity families onto one core (measured: the blocked
levenshtein join ran 9.5x faster once spread).

``fanout`` widens a DataFrame to the cluster's parallelism ONLY when its
current plan has fewer partitions -- at real scale (thousands of splits)
it is a no-op, so the exchange exists exactly when the input, not the
cluster, is the parallelism bottleneck. Apply it to the NARROW projection
feeding heavy per-row compute, never to a raw wide scan (guide §2.3:
project before the exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def reuse(df: DataFrame, scoped: bool | None = None) -> DataFrame:
    """Mark a multiply-referenced frame for reuse (guide §2.4/§5).

    Scoped sessions (the default) ``persist()`` -- the builder releases
    the cache before returning where it can. Bench's lazy-bracket mode
    (``SPARK_GRAFT_SCOPED_CACHE=0``) used to leave such frames bare, so
    every downstream leg re-derived the whole subtree. A LAZY
    ``localCheckpoint`` keeps the bracket honest -- nothing runs at
    build time; the first timed action materializes the blocks once and
    every other leg reads them -- and the lineage truncation also
    collapses the physical plan (round-11 finding F4)."""
    if scoped is None:
        scoped = os.environ.get("SPARK_GRAFT_SCOPED_CACHE", "1") != "0"
    return df.persist() if scoped else df.localCheckpoint(eager=False)


def fanout(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to ``num_partitions`` (default: the
    cluster's ``defaultParallelism``) when — and only when — the plan
    currently has fewer partitions. Row order is not preserved; callers
    must not rely on scan order (none of the registered queries do —
    every output contract orders explicitly)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
