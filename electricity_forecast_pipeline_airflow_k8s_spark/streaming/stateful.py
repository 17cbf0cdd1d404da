"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9 / task brief: "applyInPandasWithState for custom stateful
operators").

Online per-group anomaly detection: each group carries Welford running
statistics (n, mean, M2) in group state across micro-batches; incoming
values are z-scored against the state BEFORE it is updated, so a level
shift is flagged on arrival. This is the streaming generalization of the
batch IQR outlier pass -- state is O(3 doubles) per group regardless of
stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("respondent", T.StringType()),
        T.StructField("period", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def running_anomalies(
    stream: DataFrame,
    z_threshold: float = 4.0,
    min_history: int = 20,
    group_col: str = "respondent",
    ts_col: str = "period",
    value_col: str = "value",
) -> DataFrame:
    """Flag values whose z-score against the group's RUNNING history
    exceeds ``z_threshold`` (after ``min_history`` observations). State
    survives across micro-batches via Spark's state store."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out = []
        for pdf in batches:
            pdf = pdf.sort_values(ts_col)
            for _, row in pdf.iterrows():
                v = row[value_col]
                if v is None or pd.isna(v):
                    continue
                v = float(v)
                if n >= min_history and m2 > 0:
                    std = (m2 / (n - 1)) ** 0.5
                    z = (v - mean) / std if std > 0 else 0.0
                else:
                    z = 0.0
                out.append(
                    {
                        group_col: key[0],
                        ts_col: row[ts_col],
                        value_col: v,
                        "zscore": round(z, 6),
                        "is_anomaly": n >= min_history and abs(z) > z_threshold,
                        "n_seen": n,
                    }
                )
                # Welford update AFTER scoring (anomalies judged against
                # history, not themselves)
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return stream.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
