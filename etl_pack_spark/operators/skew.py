"""Skew-aware join utilities for 100 TB-scale shuffles.

AQE's skew-join splitting (enabled in the session defaults) handles
most skew transparently; explicit salting remains necessary when one
side must be *aggregated* on a hot key first, or when AQE cannot help
(e.g. a hot build side in a shuffled hash join whose partitions exceed
executor memory even after splitting).

``salted_join`` implements the classic transform: the skewed (large)
side gets a random-ish salt derived from a uniform column, the compact
side is replicated ``salt`` times via explode — turning one hot
partition into ``salt`` even ones at the cost of replicating the small
side, which is the right trade whenever small × salt ≪ hot-key volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int, entropy_col: str | None = None) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of an existing
    high-entropy column (preferred — keeps runs reproducible) or a
    per-row random draw."""
    if entropy_col is not None:
        salt = F.pmod(F.xxhash64(F.col(entropy_col)), F.lit(buckets))
    else:
        salt = (F.rand() * buckets).cast("int")
    return df.withColumn(SALT_COL, salt)


def replicate_for_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Explode the compact side once per salt bucket."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )


def salted_join(
    skewed: DataFrame,
    compact: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
    entropy_col: str | None = None,
) -> DataFrame:
    """Join a skewed large side against a compact side with the salt
    trick: join keys become (key..., salt), spreading each hot key over
    ``buckets`` shuffle partitions.

    Only inner/left/semi/anti semantics are valid: the compact side is
    replicated ``buckets`` times, so any join that emits *unmatched
    compact-side rows* (right/full outer) would emit them ``buckets``
    times each."""
    if how.replace("_outer", "") in {"right", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the compact side is "
            f"replicated per salt bucket, so unmatched compact rows would be "
            f"duplicated {buckets}x; use inner/left (or AQE skew handling)"
        )
    entropy = entropy_col or on[0]
    if entropy in on:
        # salting must NOT derive from the join key (every row of a hot
        # key would land in one bucket again) → random draw
        entropy = None
    left = with_salt(skewed, buckets, entropy_col=entropy)
    right = replicate_for_salt(compact, buckets)
    out = left.join(right, [*on, SALT_COL], how)
    return out.drop(SALT_COL)
