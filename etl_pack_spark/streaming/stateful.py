"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful stream processing at all (SURVEY §2
"absent" list) — incrementality is cron + cursor + hash dedup. This
module adds the engine's custom-operator extension point for streams:
arbitrary per-key state evolved across micro-batches, Arrow-batched.

The shipped operator is a per-user running aggregate (event count +
value sum + last-seen timestamp) with idle-timeout eviction — the shape
a fraud counter, rate limiter, or feature accumulator takes. State is
one small struct per key, partitioned by Spark across executors, and a
key idle past the timeout is EMITTED ONCE MORE AND REMOVED — without
that, per-key state grows without bound over a long-running stream
(every user ever seen stays resident forever).
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

# last_us: last-seen event time as epoch microseconds, kept IN state so
# the eviction emission can carry it (the timed-out invocation sees no
# batch rows to read a timestamp from)
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_us", LongType()),
    ]
)


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = 30_000
) -> DataFrame:
    """Per-user running totals as a stateful stream transform. Works on
    a streaming DataFrame (update output mode); each micro-batch emits
    the refreshed totals for users seen in that batch.

    ``idle_timeout_ms``: a key with no events for this long (processing
    time) is emitted one final time and its state REMOVED — bounding
    total state at (keys active within the window), not (keys ever
    seen). ``None`` disables eviction (state then grows monotonically;
    only for short-lived backfills).

    Caveat: with processing-time timers armed, an ``availableNow``
    replay keeps scheduling timer-check micro-batches after the data
    drains, so ``awaitTermination()`` may not return — bounded replays
    should ``awaitTermination(timeout)`` + ``stop()``, or pass
    ``idle_timeout_ms=None``. Continuous production streams (the
    operator's actual habitat) are unaffected.

    The update fn is nested so cloudpickle ships it by value —
    executors never need this package importable (works from any
    session, not just ``get_spark``'s addPyFile-equipped ones)."""

    evict = idle_timeout_ms is not None

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if evict and state.hasTimedOut:
            # idle key: final emission, then drop the state entirely
            n, total, last_us = state.get
            state.remove()
            last_ts = pd.Timestamp(last_us * 1000) if last_us is not None else None
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n],
                 "sum_value": [total], "last_ts": [last_ts]}
            )
            return
        n, total, last_us = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            mx_us = mx.value // 1000
            last_us = mx_us if last_us is None else max(last_us, mx_us)
        state.update((n, total, last_us))
        if evict:
            # re-arm the idle timer on every update touching this key
            state.setTimeoutDuration(idle_timeout_ms)
        last_ts = pd.Timestamp(last_us * 1000) if last_us is not None else None
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n],
             "sum_value": [total], "last_ts": [last_ts]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if evict else GroupStateTimeout.NoTimeout
        ),
    )
