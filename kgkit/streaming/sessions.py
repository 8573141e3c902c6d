"""Custom stateful streaming operator: user sessionization with
``applyInPandasWithState`` (gap-based sessions over an event stream).

The batch twin is the oracled ``user_sessions`` query
(kgkit/queries.py — window cumsum over gap flags); this operator keeps
one open session per user in GroupState and EMITS a session once a
later event proves it closed (gap > ``gap_sec``).  The open tail
session stays in state — in production a ProcessingTimeTimeout would
flush idle users; kept NoTimeout here for determinism.

State per user: (session_start_us, last_ts_us, n_events, total_value).
Late/out-of-order data within a micro-batch is handled by sorting the
batch; cross-batch disorder is the stream's watermark problem (the
windowed variant in mentions_stream.py shows that trade)."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_sec: int,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    pdf = pd.concat(list(batches)).sort_values("ts")
    ts_us = (pdf["ts"].astype("int64") // 1000).tolist()  # ns -> us
    values = pdf["value"].tolist()

    if state.exists:
        start_us, last_us, n_events, total_value = state.get
    else:
        start_us = last_us = None
        n_events, total_value = 0, 0.0

    closed = []
    gap_us = gap_sec * 1_000_000
    for t, v in zip(ts_us, values):
        if last_us is not None and t - last_us > gap_us:
            closed.append((user_id, start_us, last_us, n_events, total_value))
            start_us, n_events, total_value = t, 0, 0.0
        if start_us is None:
            start_us = t
        last_us = t
        n_events += 1
        total_value += v

    state.update((start_us, last_us, n_events, float(total_value)))
    if closed:
        out = pd.DataFrame(
            closed,
            columns=["user_id", "start_us", "end_us", "n_events", "total_value"],
        )
        yield pd.DataFrame({
            "user_id": out["user_id"],
            "session_start": pd.to_datetime(out["start_us"], unit="us"),
            "session_end": pd.to_datetime(out["end_us"], unit="us"),
            "n_events": out["n_events"],
            "total_value": out["total_value"].round(4),
        })


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """events stream (user_id, ts, value, ...) -> closed sessions."""
    def fn(key, batches, state):
        return _sessionize_group(key, batches, state, gap_sec)

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
