"""Bounded-broadcast guard for model-shaped intermediates.

Several operators join a VOCABULARY-sized model frame (unigram token
model, NB log-likelihood table) onto corpus-sized exploded tokens. On
clean corpora zipf keeps those models tiny, so a forced ``F.broadcast``
is the right plan — but a 100 TB raw web crawl's vocabulary (typo and
noise tokens) can reach tens of GB, and a forced broadcast ignores
``spark.sql.autoBroadcastJoinThreshold`` entirely: the driver collects
and every executor materializes the whole table → OOM.

:func:`maybe_broadcast` keeps the fast path and bounds the blast
radius: a ``limit(n+1).count()`` probe (never scans more than the bound
itself) proves the model is small before hinting; past the bound the
frame is returned UNHINTED so AQE picks the join strategy from real
runtime sizes (a shuffled hash join on the token key — the correct
plan for a genuinely huge model).

Callers should probe a persisted/pooled frame (the probe and the join
would otherwise run the model's lineage twice) — every call site here
derives the model from a ``pooled_persist`` aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2M rows ≈ low hundreds of MB at typical (token, double) widths:
# comfortably broadcastable on executors sized for 100 TB inputs, and
# far past the point where zipf says a real vocabulary has gone wrong.
MAX_BROADCAST_MODEL_ROWS = 2_000_000


def known_row_count(df: DataFrame) -> int | None:
    """The EXACT row count Catalyst already carries for plans that
    optimize to a driver-local relation (r16): ``createDataFrame``
    output, ``range``, and anything constant-folded onto them expose
    ``Statistics.rowCount`` without running a job. Returns ``None``
    for every distributed plan — with CBO off, only local/range leaves
    carry a rowCount, and those are exact by construction; the
    LocalRelation gate below keeps this conservative even if a future
    config turns estimated CBO rowCounts on."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        cls = plan.getClass().getSimpleName()
        if cls not in ("LocalRelation", "OneRowRelation", "Range"):
            return None
        rc = plan.stats().rowCount()
        return int(str(rc.get())) if rc.isDefined() else None
    except Exception:  # noqa: BLE001 — any introspection hiccup: probe
        return None


def maybe_broadcast(model: DataFrame, max_rows: int | None = None) -> DataFrame:
    """``F.broadcast(model)`` only when a bounded row probe proves the
    model fits; otherwise the frame unhinted (AQE decides).

    ``max_rows`` defaults to the CURRENT ``MAX_BROADCAST_MODEL_ROWS``
    (read at call time, so tests and callers can tune the bound).

    Zero-job fast path (r16, round-15 VERDICT #2): a model whose plan
    is already a driver-local relation (the components union-find
    labeling, collected centroid frames) has an EXACT rowCount in its
    plan stats — the probe job is skipped, same verdict, one fewer
    eager action per call."""
    if max_rows is None:
        max_rows = MAX_BROADCAST_MODEL_ROWS
    n = known_row_count(model)
    if n is None:
        n = model.limit(max_rows + 1).count()
    if n > max_rows:
        return model
    return F.broadcast(model)
