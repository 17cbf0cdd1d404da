"""Hashing helpers. md5-based constructions are engine-portable (identical
in DuckDB/Trino/Spark -- used wherever oracle parity matters: minhash,
simhash, fingerprints); xxhash64 is the faster Spark-only alternative for
production paths that don't need cross-engine determinism."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_hash(*cols, portable: bool = True) -> Column:
    """Deterministic row hash. portable=True -> md5 over concatenated
    values (cross-engine); False -> xxhash64 (faster, Spark-native)."""
    parts = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    if portable:
        return F.md5(F.concat_ws("\x1f", *parts))
    return F.xxhash64(*parts)


def hex_nibble(hash_col, pos: int) -> Column:
    """Value 0-15 of hex character ``pos`` (1-based) of a hex-digest
    column -- the building block for md5-derived bit features (simhash,
    LSH planes)."""
    return F.conv(F.substring(hash_col, pos, 1), 16, 10).cast("int")
