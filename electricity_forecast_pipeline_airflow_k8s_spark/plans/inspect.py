"""Physical-plan inspection: programmatic access to what Catalyst actually
chose, so tests can PIN optimizer behavior (filter pushdown, column
pruning, broadcast selection, shuffle counts) instead of hoping for it.

The reference hand-codes its pushdowns into the REST request
(`core/data_extraction.py:62-74`); here they are optimizer outputs, and
these helpers make them assertable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (ReadSchema) -- pruning check."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def forced_broadcast_count(df: DataFrame) -> int:
    """Explicit ``F.broadcast()`` hints in the analyzed logical plan --
    distinguishes hand-forced broadcasts (which OOM when the hinted side
    grows with SF) from ones Catalyst/AQE chose by measured size."""
    text = df._jdf.queryExecution().analyzed().toString()  # type: ignore[attr-defined]
    return text.count("ResolvedHint (strategy=broadcast)")


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (pre-AQE).

    Counted on the SIMPLE explain mode: its one-line nodes read
    ``Exchange hashpartitioning(...)``. The formatted mode splits the node
    name (``Exchange (14)``) from its arguments (``Arguments:
    hashpartitioning(...)``), so substring counts there are silently zero
    (ADVICE r3)."""
    text = explain_str(df, "simple")
    return text.count("Exchange hashpartitioning") + text.count(
        "Exchange rangepartitioning"
    )


def plan_counts(df: DataFrame) -> dict[str, int]:
    """Robust node counts from the simple-mode plan: broadcast joins (hash
    AND nested-loop -- a broadcast-scalar cross join is the latter), hash
    exchanges, range exchanges, broadcast exchanges, scans."""
    text = explain_str(df, "simple")
    return {
        "broadcast_joins": text.count("BroadcastHashJoin")
        + text.count("BroadcastNestedLoopJoin"),
        "hash_exchanges": text.count("Exchange hashpartitioning"),
        "range_exchanges": text.count("Exchange rangepartitioning"),
        "broadcast_exchanges": text.count("BroadcastExchange"),
        "parquet_scans": text.count("Scan parquet") + text.count("FileScan parquet"),
    }
