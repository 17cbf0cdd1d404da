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


# -- transformWithState (Spark 4 arbitrary-state API) ------------------------
# The successor API to applyInPandasWithState: typed per-group state
# handles (ValueState here), explicit init/close lifecycle, timers. The
# processor keeps (count, cent-exact sum, max) per group across
# micro-batches and emits the running totals each batch; integer cents
# make the accumulation exact and therefore independent of the order in
# which the file source serves batches.
try:  # pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStatsProcessor(StatefulProcessor):
        """Per-group running (n, sum, max) with ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("cents", T.LongType()),
                        T.StructField("mx", T.DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, cents, mx = (
                self._state.get() if self._state.exists() else (0, 0, None)
            )
            for pdf in rows:
                vals = pdf["value"].dropna()
                n += int(len(vals))
                # 2-decimal values -> exact integer cents, so cross-batch
                # accumulation order cannot change the total
                cents += int((vals * 100).round().astype("int64").sum())
                if len(vals):
                    batch_max = float(vals.max())
                    mx = batch_max if mx is None else max(mx, batch_max)
            self._state.update((n, cents, mx))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_seen": [n],
                    "total_value": [cents / 100.0],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            """No resources to release: state lives in the store handle
            Spark owns (required StatefulProcessor interface method)."""

except ImportError:  # pragma: no cover - pyspark < 4.0
    RunningStatsProcessor = None  # type: ignore[assignment]

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def running_stats_tws(stream: DataFrame) -> DataFrame:
    """Apply the transformWithState running-stats processor per
    event_type. Caller picks sink/trigger; state is O(3 scalars) per
    group regardless of stream length."""
    return stream.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
