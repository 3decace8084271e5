"""Custom stateful streaming operators via applyInPandasWithState.

Where windowed aggregation (streaming/incremental.py) covers the
reference's batch analogs, arbitrary per-key state is the escape hatch
for operators Spark's built-ins can't express — running per-entity
accumulators, custom session logic, dedup-with-memory. State lives in the
checkpointed state store, so a crashed/restarted query resumes exactly.

The state update function receives Arrow-batched pandas frames per key —
vectorized, not per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("last_ts", TimestampType(), True),
    ]
)
RUNNING_TOTALS_STATE = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("last_ts_us", LongType(), True),
    ]
)


def _update_running_totals(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running event totals — the streaming twin of the
    reference's running-max watermark accumulator (A1,
    incremental_loaders.py:128-131), generalized to arbitrary state."""
    (user_id,) = key
    n, last_us = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        valid_ts = pdf["ts"].dropna()  # all-null ts → NaT.max() would
        if len(valid_ts):  # poison the watermark with int64-min
            us = int(valid_ts.max().value // 1000)  # pandas ns → µs
            last_us = us if last_us is None else max(last_us, us)
    state.update((n, last_us))
    last_ts = pd.Timestamp(last_us * 1000) if last_us is not None else None
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "last_ts": [last_ts]})


def running_event_totals(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, ...) → per-user running totals with
    checkpointed state. Output mode 'update': one row per touched user
    per micro-batch carrying the cumulative count."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
