"""Temporal joins Spark lacks as primitives: as-of join and range join.

Both are implemented as compositions of existing DataFrame operators
(no UDFs, no custom Catalyst rules), chosen for their shuffle shape at
scale:

* **As-of join** — "for each left row, the latest right row at or
  before its timestamp, per key" (market-data / telemetry enrichment).
  Implemented with the union+window trick: tag both sides, sort within
  key by (ts, right-first), carry the last-seen right payload forward
  with ``last(ignorenulls)``, keep left rows. ONE shuffle (the window
  partitioning), no join node at all — strictly better than the
  broadcast-nested-loop a naive ``ts <= ts`` join would plan, and it
  scales to any key cardinality.

* **Range join** — "probe rows falling inside [start, end) windows".
  A raw interval predicate plans as a nested-loop cartesian; bucketing
  the time axis turns it into an equi-join on bucket id (ranges explode
  into the buckets they cover, probes map to one bucket) with an exact
  refine filter after — the standard interval-join optimization, all
  composed from explode + join + filter.

The DuckDB oracles use the engine-native formulations (``ASOF JOIN``,
plain ``BETWEEN`` join), so the compositions are checked against an
independent implementation, not themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: latest right row with
    ``right.ts <= left.ts`` per ``on`` key; left rows with no
    predecessor keep NULL payload (left-outer semantics).

    Right side should be unique per (key, ts) — pre-aggregate if not —
    so the match is well-defined.
    """
    right_payload = right_payload or [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on), F.col(left_ts).alias("__ts"), F.lit(0).alias("__is_r"),
        F.struct(*left.columns).alias("__l"), F.lit(None).cast(
            right.select(F.struct(F.col(right_ts).alias(f"{right_ts}{suffix}"),
                                  *[F.col(c).alias(f"{c}{suffix}") for c in right_payload]
                                  ).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on), F.col(right_ts).alias("__ts"), F.lit(1).alias("__is_r"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(F.col(right_ts).alias(f"{right_ts}{suffix}"),
                 *[F.col(c).alias(f"{c}{suffix}") for c in right_payload]).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows order BEFORE left rows at equal ts (<= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    return (
        carried.where(F.col("__is_r") == 0)
        .select("__l.*", "__match.*")
    )


def range_join(
    probe: DataFrame,
    ranges: DataFrame,
    probe_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Interval join: probe rows with ``start <= probe_ts <= end``.

    Ranges explode into every ``bucket_seconds`` bucket they overlap,
    probes map to exactly one bucket, the join is equi on (bucket [+
    extra keys]) and the interval predicate refines after — candidate
    volume is bounded by rows-per-bucket instead of |probe| x |ranges|.
    Pick ``bucket_seconds`` near the typical range length: shorter
    buckets replicate ranges more, longer buckets widen candidates.
    """
    extra_on = extra_on or []
    pb = probe.withColumn("__bucket", (F.unix_timestamp(F.col(probe_ts)) / bucket_seconds).cast("long"))
    rb = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long"),
            )
        ),
    )
    joined = pb.join(rb, ["__bucket", *extra_on])
    return joined.where(
        F.col(probe_ts).between(F.col(start_col), F.col(end_col))
    ).drop("__bucket")
