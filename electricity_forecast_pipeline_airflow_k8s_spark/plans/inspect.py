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
    """Number of Exchange operators in the physical plan (pre-AQE)."""
    return explain_str(df).count("Exchange hashpartitioning") + explain_str(
        df
    ).count("Exchange rangepartitioning")
