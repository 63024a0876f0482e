"""Bounded LRU pool of persisted intermediate DataFrames.

Operators return LAZY frames whose plans reference a persisted
intermediate (minhash signatures, token-count models) more than once —
the persist must outlive the call, but unbounded persists leak over a
long session, and unpersist-on-next-call would defeat Spark's own
plan-matching cache reuse (an identical repeated invocation — bench
loop, notebook re-run — should hit the warm frame, not recompute).

An LRU keyed by semantic hash gives both: repeats reuse the cached
frame, and only the ``POOL_MAX`` most recent distinct plans stay
resident. A pool hit whose cache was externally cleared
(``spark.catalog.clearCache()``) re-persists instead of silently
re-executing the lineage once per downstream reference.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

_POOL: "OrderedDict[int, DataFrame]" = OrderedDict()
POOL_MAX = 16


def pooled_persist(df: DataFrame) -> DataFrame:
    key = df.semanticHash()
    cached = _POOL.get(key)
    if cached is not None and cached.sameSemantics(df):
        if cached.storageLevel.useMemory or cached.storageLevel.useDisk:
            _POOL.move_to_end(key)
            return cached
        _POOL.pop(key, None)
    if cached is not None and not cached.sameSemantics(df):
        # semanticHash collision: release the old frame's cache before
        # the pool loses its only reference to it
        cached.unpersist(False)
        _POOL.pop(key, None)
    _POOL[key] = df.persist()
    _POOL.move_to_end(key)
    while len(_POOL) > POOL_MAX:
        _, old = _POOL.popitem(last=False)
        old.unpersist(False)
    return df
