"""CDC merge plans: latest-wins upsert, change-stream application, and
SCD-2 history building.

The reference's only load mode is insert-only dedup append
(etl.go:59-68 — H1 row hash + snapshot anti-join); a source row that
*changes* is re-appended as a new row and the stale version survives.
Real incremental warehousing needs the other three load modes, all
missing from the reference's surface and added here as Spark-first
plans:

  * :func:`merge_upsert` — latest version per business key wins
    (MERGE ... WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT).
  * :func:`apply_cdc` — fold an I/U/D change stream into a target
    (deletes actually delete).
  * :func:`scd2_build` / :func:`scd2_merge` — type-2 slowly-changing
    dimension: full version history with effective_from/effective_to
    validity ranges and an is_current flag.

Scale design — every plan here is ONE shuffle on the business key:
history ∪ changes → window(partitionBy key, orderBy ts desc) →
row_number/lead. There is no join in the upsert path at all (a
full-outer join would shuffle both sides AND build hash tables; the
union+window folds everything in a single sort-based aggregation that
AQE can coalesce). Deletes and SCD-2 closure fall out of the same
window pass. At 100 TB the window partitions by key hash exactly like
the join would, but with one stage fewer and no skewed build side; a
partitioned target additionally prunes history to the touched key
range when callers pre-filter (same posture as transfer.py's windowed
snapshot).

Determinism: ties on (ts) between target and changes resolve by source
priority (changes win), then by a caller-supplied total order if keys
can carry duplicate timestamps; all tie-breaks are explicit window
order columns, never partitioning accidents. DuckDB oracle twins
(:func:`merge_upsert_sql`, :func:`scd2_build_sql`) compute identical
semantics for cross-engine hash checks in the tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SRC = "__src_priority"
_RN = "__rn"


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """Latest-wins merge: one row per business key, the version with the
    greatest ``ts_col`` (changes beat target on ties).

    Equivalent to ``MERGE WHEN MATCHED AND c.ts >= t.ts THEN UPDATE
    WHEN NOT MATCHED THEN INSERT``. One shuffle (the window); no join.
    """
    cols = target.columns
    both = target.withColumn(_SRC, F.lit(0)).unionByName(
        changes.select(*cols).withColumn(_SRC, F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc(), F.col(_SRC).desc())
    return (
        both.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .select(*cols)
    )


def merge_upsert_sql(target_sql: str, changes_sql: str, keys: list[str], ts_col: str) -> str:
    """DuckDB oracle twin of :func:`merge_upsert` (same tie-break)."""
    key_list = ", ".join(keys)
    return f"""
    SELECT * EXCLUDE (__src_priority) FROM (
        SELECT * FROM (
            SELECT *, 0 AS __src_priority FROM ({target_sql})
            UNION ALL
            SELECT *, 1 AS __src_priority FROM ({changes_sql})
        )
        QUALIFY row_number() OVER (
            PARTITION BY {key_list}
            ORDER BY {ts_col} DESC, __src_priority DESC
        ) = 1
    )
    """


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Fold an insert/update/delete change stream into ``target``.

    ``changes`` carries ``op_col`` ∈ {'I','U','D'} (case-insensitive).
    The latest change per key wins; a winning 'D' removes the key. The
    target's own rows participate as op='I' at their stored timestamp,
    so a change older than the stored row is a no-op — the same
    convergence rule Debezium-style consumers use. WITHIN one call the
    fold is order-free (the window sees every change at once) and
    re-applying any subset of already-applied changes is a no-op
    (idempotent under replay). ACROSS sequential calls there is one
    asymmetry: a winning delete leaves no tombstone in the target, so a
    LATER call carrying only an older insert for that key would
    resurrect it — sequential folds need in-order batches (what a
    checkpointed stream provides) or a sink that retains tombstones.
    Single shuffle, same window shape as :func:`merge_upsert`.
    """
    cols = target.columns
    tgt = (
        target.select(*cols)
        .withColumn("__op", F.lit("I"))
        .withColumn(_SRC, F.lit(0))
    )
    ch = (
        changes.withColumn("__op", F.upper(F.col(op_col)))
        .select(*cols, "__op")
        .withColumn(_SRC, F.lit(1))
    )
    both = tgt.unionByName(ch)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc(), F.col(_SRC).desc())
    return (
        both.withColumn(_RN, F.row_number().over(w))
        .where((F.col(_RN) == 1) & (F.col("__op") != "D"))
        .select(*cols)
    )


def scd2_build(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Type-2 history from a change stream: every version of every key,
    valid [effective_from, effective_to); open-ended current version has
    NULL effective_to and ``is_current = true``.

    One shuffle: lead(ts) over (key, ts). Exact duplicate timestamps per
    key would create zero-width ranges — they are collapsed to one row
    per (key, ts) first, the survivor chosen by ordering on the
    remaining columns (total order ⇒ deterministic across engines,
    partitionings, and replays; callers with a sequence column should
    pre-dedup on it instead).
    """
    rest = [c for c in changes.columns if c not in set(keys) | {ts_col}]
    # ONE exchange for both windows: dedup-per-(key, ts) runs as a lag
    # over the SAME key partitioning the lead() needs (first row of each
    # equal-ts run under (ts, rest) order == the row_number()==1
    # survivor of a (key, ts)-partitioned window, but that shape would
    # hash-partition on (key, ts) and force a second shuffle for the
    # history window). The (ts, rest) sort also satisfies the lead
    # window's ts-prefix ordering, so no extra sort either.
    order = [F.col(ts_col).asc_nulls_first()] + [
        F.col(c).asc_nulls_first() for c in rest
    ]
    w_order = Window.partitionBy(*keys).orderBy(*order)
    w_hist = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc_nulls_first())
    prev_ts = F.lag(ts_col).over(w_order)
    # A row is a duplicate only if a PREVIOUS row exists with the same ts
    # (null-safe). Bare eqNullSafe(prev_ts) would also fire on the
    # partition's FIRST row when its ts is NULL (lag default NULL ==
    # NULL-ts row), silently dropping every NULL-ts key's survivor.
    has_prev = F.lag(F.lit(1)).over(w_order).isNotNull()
    return (
        changes.withColumn(_RN, has_prev & F.col(ts_col).eqNullSafe(prev_ts))
        .where(~F.col(_RN))
        .drop(_RN)
        .withColumn(effective_from, F.col(ts_col))
        .withColumn(effective_to, F.lead(ts_col).over(w_hist))
        .withColumn(current_flag, F.col(effective_to).isNull())
    )


def scd2_build_sql(
    changes_sql: str,
    keys: list[str],
    ts_col: str,
    rest_cols: list[str],
) -> str:
    """DuckDB oracle twin of :func:`scd2_build` (dedup-then-lead);
    ``rest_cols`` = the non-key non-ts columns, in DataFrame order, so
    the tie-break total order matches Spark's."""
    key_list = ", ".join(keys)
    order = ", ".join(f"{c} ASC NULLS FIRST" for c in rest_cols) or "1"
    # ts ordering is explicit NULLS FIRST to match Spark's asc_nulls_first
    # (DuckDB defaults ASC to NULLS LAST, Spark to NULLS FIRST).
    hist = f"PARTITION BY {key_list} ORDER BY {ts_col} ASC NULLS FIRST"
    return f"""
    SELECT *,
           {ts_col} AS effective_from,
           lead({ts_col}) OVER ({hist}) AS effective_to,
           lead({ts_col}) OVER ({hist}) IS NULL AS is_current
    FROM (
        SELECT * FROM ({changes_sql})
        QUALIFY row_number() OVER (
            PARTITION BY {key_list}, {ts_col} ORDER BY {order}
        ) = 1
    )
    """


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Merge new changes into an existing SCD-2 dimension: closed
    historical rows pass through untouched; current rows close out when
    a newer change arrives; changes append as new versions.

    Closed history never re-enters the window (it is immutable by
    definition), so the shuffle covers only current rows + changes —
    at scale that is the working set, not the dimension's full history.
    """
    attr_cols = [
        c for c in dim.columns
        if c not in {effective_from, effective_to, current_flag}
    ]
    closed = dim.where(~F.col(current_flag))
    current = dim.where(F.col(current_flag)).select(*attr_cols)
    incoming = changes.select(*attr_cols)
    unioned = current.withColumn("__src", F.lit(0)).unionByName(
        incoming.withColumn("__src", F.lit(1))
    )
    # Replay safety: a change not strictly newer than the stored current
    # version is a re-delivery (or late data already superseded) — drop
    # it, or it would splice a version inside immutable closed history.
    # max-over-key window, same partitioning as the lead() pass below,
    # so Spark reuses one exchange for both.
    w_key = Window.partitionBy(*keys)
    stored_ts = F.max(F.when(F.col("__src") == 0, F.col(ts_col))).over(w_key)
    live = (
        unioned.withColumn("__stored_ts", stored_ts)
        .where(
            (F.col("__src") == 0)
            | F.col("__stored_ts").isNull()
            | (F.col(ts_col) > F.col("__stored_ts"))
        )
        .drop("__stored_ts", "__src")
    )
    rebuilt = scd2_build(
        live, keys, ts_col, effective_from, effective_to, current_flag
    )
    return closed.unionByName(rebuilt)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Derive the I/U/D CHANGE STREAM from two snapshots of a keyed
    table — the inverse of :func:`apply_cdc`: reconciliation when the
    source system exposes no change log (the posture the reference's
    re-scan world lives in, upgraded from append-only to full diff).

    Requires ``keys`` unique AND non-NULL within each snapshot (NULL
    business keys have no cross-engine-stable identity: a group-by
    matches them, a join does not — reject them upstream), identical
    schemas, and ORDERABLE payload columns (maps are not — cast them
    to a comparable rendering first; the struct compare needs Spark
    ordering). Returns one row per changed key: the key columns,
    ``op`` ∈ {'I','U','D'}, and the payload columns (new side for
    I/U, the departing old side for D). Unchanged keys emit nothing.
    The round-trip law — ``apply_cdc(old, snapshot_diff(old, new) +
    ts) == new`` — is pinned in tests/test_merge.py.

    Scale shape: the module's union-not-join idiom — old ∪ new with a
    side tag, then ONE combinable groupBy on the key collecting each
    side's payload struct; change detection is a null-safe struct
    compare (NOT the H1 multiset hash, whose cell-sorting would call
    two columns with swapped values "unchanged"). No full-outer join
    (two shuffled sides + a hash table build); the DuckDB oracle twin
    deliberately IS the full-outer-join formulation, so two
    independent plans must agree.
    """
    cols = old.columns
    if new.columns != cols:
        raise ValueError(f"schema mismatch: {cols} vs {new.columns}")
    if op_col in cols:
        raise ValueError(
            f"op_col {op_col!r} collides with an input column; pass a "
            f"different op_col"
        )
    payload = [c for c in cols if c not in keys]
    for f in old.schema.fields:
        if f.name in payload and "map<" in f.dataType.simpleString():
            raise ValueError(
                f"payload column {f.name!r} is a map — not orderable in "
                f"Spark; cast it to a comparable rendering (e.g. sorted "
                f"json) before diffing"
            )

    def tagged(df, src):
        return df.select(
            *keys,
            F.struct(*payload).alias("__p"),
            F.lit(src).alias("__src"),
        )

    u = tagged(old, 0).unionByName(tagged(new, 1))
    agg = u.groupBy(*keys).agg(
        F.max(F.when(F.col("__src") == 0, F.lit(1))).alias("__in_o"),
        F.max(F.when(F.col("__src") == 1, F.lit(1))).alias("__in_n"),
        F.max(F.when(F.col("__src") == 0, F.col("__p"))).alias("__po"),
        F.max(F.when(F.col("__src") == 1, F.col("__p"))).alias("__pn"),
    )
    op = (
        F.when(F.col("__in_o").isNull(), "I")
        .when(F.col("__in_n").isNull(), "D")
        .when(~F.col("__po").eqNullSafe(F.col("__pn")), "U")
    )
    flagged = agg.withColumn(op_col, op).where(F.col(op_col).isNotNull())
    pick = [
        F.when(F.col(op_col) == "D", F.col(f"__po.{c}"))
        .otherwise(F.col(f"__pn.{c}"))
        .alias(c)
        for c in payload
    ]
    return flagged.select(*keys, *pick, op_col)


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    keys: list[str],
    payload: list[str],
    op_col: str = "op",
) -> str:
    """DuckDB oracle twin of :func:`snapshot_diff` — deliberately the
    OTHER formulation (full outer join + per-column IS DISTINCT FROM)
    so an independent plan checks the struct-compare one. Shares the
    engine's non-NULL-keys requirement: a NULL key never matches in
    the join, so the two formulations only agree when keys are
    non-NULL (which the engine contract demands anyway)."""
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    differs = (
        " OR ".join(f"o.{c} IS DISTINCT FROM n.{c}" for c in payload)
        or "FALSE"  # keys-only table: a pure membership (I/D) diff
    )
    key0 = keys[0]
    sel_keys = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in keys)
    sel_payload = "".join(
        f", CASE WHEN n.{key0} IS NULL THEN o.{c} ELSE n.{c} END AS {c}"
        for c in payload
    )
    return f"""
    SELECT {sel_keys}{sel_payload},
           CASE WHEN o.{key0} IS NULL THEN 'I'
                WHEN n.{key0} IS NULL THEN 'D'
                ELSE 'U' END AS {op_col}
    FROM ({old_sql}) o FULL JOIN ({new_sql}) n ON {on}
    WHERE o.{key0} IS NULL OR n.{key0} IS NULL OR ({differs})
    """
