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
    so the match is well-defined. NULL join keys follow equi-join (and
    DuckDB ASOF JOIN) semantics: a NULL-key left row never matches a
    NULL-key right row (window partitioning would otherwise group the
    NULLs together — right rows with NULL key are dropped up front).
    """
    right = right.where(F.col(on).isNotNull())
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
    max_buckets: int = 100_000,
) -> DataFrame:
    """Interval join: probe rows with ``start <= probe_ts <= end``.

    Ranges explode into every ``bucket_seconds`` bucket they overlap,
    probes map to exactly one bucket, the join is equi on (bucket [+
    extra keys]) and the interval predicate refines after — candidate
    volume is bounded by rows-per-bucket instead of |probe| x |ranges|.
    Pick ``bucket_seconds`` near the typical range length: shorter
    buckets replicate ranges more, longer buckets widen candidates.

    ``max_buckets`` guards the explode: a single sentinel-dated range
    (end = 9999-12-31) would otherwise expand to tens of millions of
    rows; exceeding the bound fails fast with a clear error instead.
    """
    extra_on = extra_on or []
    pb = probe.withColumn("__bucket", (F.unix_timestamp(F.col(probe_ts)) / bucket_seconds).cast("long"))
    b_lo = (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long")
    b_hi = (F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long")
    # the guard lives INSIDE the bucket expression — a separate asserted
    # column would be pruned away as unused by the optimizer
    msg = (
        f"range_join: a range spans more than {max_buckets} buckets of "
        f"{bucket_seconds}s; raise bucket_seconds/max_buckets or pre-clip "
        f"sentinel end dates"
    )
    # NULL start/end must stay NULL (explode drops them — the BETWEEN
    # refine could never match them anyway), NOT fall into the
    # raise_error branch: (b_hi - b_lo) < max_buckets is NULL for NULL
    # bounds, and relying on optimizer-inferred IsNotNull pushdown to
    # pre-prune them would turn a plan change into whole-job failures.
    guarded_seq = (
        F.when(b_lo.isNull() | b_hi.isNull(), F.lit(None).cast("array<bigint>"))
        .when((b_hi - b_lo) < F.lit(max_buckets), F.sequence(b_lo, b_hi))
        .otherwise(F.raise_error(F.lit(msg)).cast("array<bigint>"))
    )
    rb = ranges.withColumn("__bucket", F.explode(guarded_seq))
    joined = pb.join(rb, ["__bucket", *extra_on])
    return joined.where(
        F.col(probe_ts).between(F.col(start_col), F.col(end_col))
    ).drop("__bucket")



def _window_micros(window: str) -> int:
    """Parse the shared interval grammar ("1 hour", "15 minutes", ...)
    to microseconds — defined ONCE for the Spark frame and its DuckDB
    oracle twin so the two engines can never frame on different
    windows."""
    import re

    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", window.strip())
    if not m:
        raise ValueError(f"unsupported window {window!r}")
    return int(m.group(1)) * {
        "second": 1, "minute": 60, "hour": 3600, "day": 86400
    }[m.group(2)] * 1_000_000


def rolling_aggregate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: str = "1 hour",
) -> DataFrame:
    """Time-based moving aggregates per key: for every event, the
    count/sum/min/max of ``value_col`` over the trailing ``window``
    (RANGE frame ending at the current row, inclusive).

    One hash exchange on the key + one in-partition sort — the same
    shuffle any per-key window needs; the RANGE frame itself is a
    streaming pass over the sorted partition (no per-row rescans).
    ``window`` accepts the Spark interval grammar ("1 hour",
    "15 minutes", ...).
    """
    micros = _window_micros(window)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-micros, 0)
    )
    return df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        F.count("*").over(w).alias("n_window"),
        F.sum(value_col).over(w).alias("sum_window"),
        F.min(value_col).over(w).alias("min_window"),
        F.max(value_col).over(w).alias("max_window"),
    )


def rolling_aggregate_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: str = "1 hour",
) -> str:
    """DuckDB twin of :func:`rolling_aggregate`.

    Frames on microsecond-truncated epoch (``epoch_us``), NOT the raw
    timestamp: the Spark side orders on ``unix_micros`` (parquet nanos
    truncated to us), so a RANGE INTERVAL frame over raw-ns timestamps
    could include/exclude an event within <1us of a trailing-window
    boundary that the Spark frame decides the other way."""
    micros = _window_micros(window)
    return f"""
    SELECT {key_col}, {ts_col}, {value_col},
           count(*) OVER w AS n_window,
           sum({value_col}) OVER w AS sum_window,
           min({value_col}) OVER w AS min_window,
           max({value_col}) OVER w AS max_window
    FROM {table}
    WINDOW w AS (
        PARTITION BY {key_col} ORDER BY epoch_us({ts_col}::TIMESTAMP)
        RANGE BETWEEN {micros} PRECEDING AND CURRENT ROW
    )
    """
