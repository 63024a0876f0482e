"""File-shaped corpus sources beyond parquet: JSONL and CSV with
corrupt-line QUARANTINE.

Training corpora arrive as JSONL dumps (one document per line — the
common crawl-derivative interchange format) and CSVs far more often
than parquet, and a 100 TB dump ALWAYS contains malformed lines. The
two modes Spark offers by default are both wrong for curation:
``FAILFAST`` kills a ten-hour job on line nine billion, and
``DROPMALFORMED`` silently deletes data. These readers take the same
strict+quarantine posture as the T1 type layer
(:func:`etl_pack_spark.schema.quarantine_invalid`): parse
``PERMISSIVE`` with the raw corrupt line captured, split the frame,
and return ``(clean_typed_rows, corrupt_raw_lines)`` so the caller
can count/inspect/repair the bad side instead of choosing between a
crash and silent loss.

Scale notes: the parse IS the scan (one pass, the corrupt column is
populated by the parser itself — no validation re-read); the split is
two filters over one cached parse, and the cache is required
semantics, not an optimization — Spark refuses to filter on the
internal corrupt-record column of an uncached parsed frame
(SPARK-21610). Callers stream the clean side onward and typically
append the corrupt side to a quarantine sink; schema is REQUIRED
(schema inference is a second full read of the dataset and
nondeterministic under corruption — never acceptable at scale).

(The reference has no file sources at all — its inputs are MySQL/
ClickHouse tables, mysql/mysql.go:36 — this is SURVEY §7.3 extension
surface, same family as the parquet fixtures path.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


class QuarantinedRead:
    """Handle for one strict+quarantine read: carries ``clean``,
    ``corrupt``, and the :meth:`release` that unpins their shared
    cached parse. Unpacks as ``(clean, corrupt)`` so existing
    two-tuple callers keep working, and is a context manager
    (``with read_jsonl(...) as (clean, corrupt): ...`` releases on
    exit).

    Why a handle (r10 ADVICE): the r9 fix hung the parse off the
    returned DataFrames as a monkey-patched attribute, but any
    TRANSFORMATION (``clean.select(...)``) returns a new DataFrame
    without it, so ``release()`` on a derived frame was a silent
    no-op and the cached parse leaked — the exact accumulation the
    function was added to fix. State now lives on this object, whose
    identity survives however the frames are transformed."""

    def __init__(self, clean: DataFrame, corrupt: DataFrame,
                 parsed: DataFrame):
        self.clean = clean
        self.corrupt = corrupt
        self._parsed = parsed
        self.released = False

    def __iter__(self):
        return iter((self.clean, self.corrupt))

    def release(self) -> None:
        """Unpersist the shared cached parse. Call ONLY after both
        sides are fully consumed: the cache is load-bearing
        (SPARK-21610 — Spark refuses corrupt-record-column filters
        over an uncached parse), so actions on either frame after
        release raise AnalysisException rather than silently
        re-reading. Idempotent."""
        if not self.released:
            self._parsed.unpersist()
            self.released = True

    def __enter__(self) -> "QuarantinedRead":
        return self

    def __exit__(self, *exc) -> bool:
        self.release()
        return False


def _split_corrupt(parsed: DataFrame, schema: T.StructType) -> QuarantinedRead:
    """Split a PERMISSIVE parse into a :class:`QuarantinedRead` of
    (clean typed rows, corrupt raw lines). The parse is cached BEFORE
    filtering: Spark disallows filtering on the internal corrupt-record
    column of a raw parsed frame (SPARK-21610), and the cache also
    makes the two filters share one physical parse. The cache is
    pinned for the lifetime of the handle — call
    :meth:`QuarantinedRead.release` (or use the handle as a context
    manager) once both sides are consumed."""
    parsed = parsed.cache()
    clean = parsed.where(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields]
    )
    corrupt = parsed.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return QuarantinedRead(clean, corrupt, parsed)


def release(handle: "QuarantinedRead | DataFrame") -> None:
    """Release the cached parse behind a :class:`QuarantinedRead`.
    Kept as a module-level function for callers of the r9 API shape;
    passing anything that is not a handle RAISES instead of silently
    doing nothing (r10 ADVICE: the r9 version keyed off an attribute
    monkey-patched onto the returned DataFrames, so release() on any
    DERIVED frame — ``clean.select(...)`` — was a silent no-op and
    the parse leaked)."""
    if isinstance(handle, QuarantinedRead):
        handle.release()
        return
    raise TypeError(
        "textfiles.release() takes the QuarantinedRead handle returned "
        "by read_jsonl/read_csv, not a DataFrame: cache state lives on "
        "the handle (a derived/foreign frame carries none, and treating "
        "it as releasable would silently leak the pinned parse)"
    )


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not define {CORRUPT_COL!r}")
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> QuarantinedRead:
    """One-document-per-line JSON under strict+quarantine: returns
    ``(clean, corrupt)`` where ``clean`` has exactly ``schema``'s
    typed columns and ``corrupt`` is ``(raw_line string)`` — every
    line that failed to parse OR failed the schema's types, verbatim.

    A type mismatch (string where a long is declared) quarantines the
    line rather than silently nulling the field — the parser runs in
    PERMISSIVE mode but the corrupt capture makes it auditable.
    Multi-line JSON is deliberately unsupported (``multiLine`` forces
    whole-file parsing — one task per FILE, no intra-file parallelism;
    JSONL exists precisely so a 100 TB dump splits by line).

    Both frames share ONE cached parse, pinned until the returned
    handle's :meth:`QuarantinedRead.release` is called (see
    :func:`_split_corrupt`)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    parsed = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split_corrupt(parsed, schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> QuarantinedRead:
    """CSV under the same strict+quarantine contract as
    :func:`read_jsonl`: malformed lines (wrong column count, unparsable
    types, broken quoting) land in the corrupt frame verbatim instead
    of crashing the job or silently vanishing. Same shared-cache
    contract: call :func:`release` when done with both sides."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    parsed = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split_corrupt(parsed, schema)
