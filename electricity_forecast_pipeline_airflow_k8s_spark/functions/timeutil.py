"""Time helpers (F1-F3): integer-microsecond arithmetic so interval
comparisons are exact and identical across engines (the reference compares
pd.Timedelta objects, `core/data_validation.py:124-126`)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interval_micros(ts_a, ts_b) -> Column:
    """Microseconds from ts_b to ts_a (a - b), exact integer math."""
    a = F.col(ts_a) if isinstance(ts_a, str) else ts_a
    b = F.col(ts_b) if isinstance(ts_b, str) else ts_b
    return F.unix_micros(a) - F.unix_micros(b)


def gap_seconds(ts_col, over) -> Column:
    """Seconds since the previous row in the given window spec (W1 gap
    detection, `core/data_validation.py:110-133`)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (F.unix_micros(c) - F.unix_micros(F.lag(c).over(over))) / 1_000_000.0
