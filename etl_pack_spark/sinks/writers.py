"""Batch sinks with row-count accounting (ops S4/S5 + X4 metrics).

The reference renders every cell back to SQL/TSV text
(mysql/writer/main.go:98-132, clickhouse/writer/main.go:95-120) and
streams per-batch ``Status{success,count}`` acks (contract.proto:45-54).
Typed Spark writers make the text rendering (op T3) moot; the ack/row
count becomes ``df.observe`` metrics collected by a listener-free
``Observation`` — no second ``count()`` job over the data.

Parquet is the in-repo sink; the JDBC writer is the live-database path
(same plan, different format). At scale, prefer partitioned parquet
(`partitionBy` on the cursor column) so the *next* incremental run's
snapshot read (H2) prunes to the current window instead of scanning
the whole target — that turns H2 from O(target) to O(window).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class WriteResult:
    """The Status ack of contract.proto:45-54, engine-side."""

    rows: int
    target: str


def append_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "append",
) -> WriteResult:
    """S4/S5: append a batch to the target with row accounting (X4's
    total-rows log, provider.go:238) via Observation — the count rides
    the write job itself."""
    obs = Observation("sink")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    writer = observed.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return WriteResult(rows=int(obs.get["rows"]), target=path)


SINK_FORMATS = {"parquet", "orc", "csv", "tsv", "json"}


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> WriteResult:
    """Format-agnostic sink twin of ``sources.formats.read_source``.

    ``tsv`` mirrors the reference's ClickHouse TSV wire sink
    (clickhouse/writer/main.go:95-120) as a CSV writer with a tab
    delimiter — the engine still writes typed values; only the file
    encoding is text. Row accounting rides the write job (Observation),
    same as :func:`append_table`.
    """
    if fmt not in SINK_FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {sorted(SINK_FORMATS)}")
    obs = Observation("sink")
    writer = df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(mode)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "tsv":
        writer.option("header", "true").option("sep", "\t").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)
    return WriteResult(rows=int(obs.get["rows"]), target=path)


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    batch_size: int = 10_000,
    mode: str = "append",
):
    """Live-database sink: typed batched INSERTs via JDBC.

    ``batchsize`` is the engine-side replacement for the reference's
    1,000-row multi-VALUES statement (mysql/writer/main.go:98-123);
    the JDBC writer binds typed parameters, so no literal quoting /
    escaping code exists to get wrong (cf. mysql/types/types.go:53).
    Returns the configured writer; call ``.save()`` in live envs.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    return writer


def insert_header(target: str, names: list[str]) -> str:
    """The reference writer's INSERT header, string-exact
    (``mysql/writer/main.go`` ``createHeader``, golden-pinned at
    ``mysql/writer/main_test.go`` — including the no-columns form and
    the trailing space). Compatibility/audit shim: real writes go
    through :func:`jdbc_writer`'s typed parameter binding."""
    cols = f" ({','.join(names)})" if names else ""
    return f"INSERT INTO {target}{cols} VALUES "


def render_insert_literal(tag: str, value: str) -> str:
    """T3 universal→storage literal rendering, reference-exact
    (``mysql/types/types.go`` ``FromUniversal``): ``int64``/``date``
    pass raw; ``datetime`` re-parses the universal ISO form and
    renders ``'YYYY-MM-DD HH:MM:SS'`` (unparseable input is an error,
    aborting the batch like the reference); EVERYTHING else — note:
    including the unsigned ints its own golden test calls "not
    supported in this version" — is quoted with ``''`` escaping."""
    import datetime as _dt

    if tag in ("int64", "date"):
        return value
    if tag == "datetime":
        v = value.replace("Z", "+00:00") if value.endswith("Z") else value
        dt = _dt.datetime.fromisoformat(v)  # Go layout 2006-01-02T15:04:05.999Z07:00
        return f"'{dt:%Y-%m-%d %H:%M:%S}'"
    return "'" + value.replace("'", "''") + "'"


def insert_batch_sql(
    target: str, names: list[str], tags: list[str], values: list[str]
) -> tuple[int, str]:
    """One multi-VALUES INSERT from a flat row-major value list —
    ``messageToQuery`` (``mysql/writer/main.go:96-123``), returning
    ``(count_rows, sql)`` exactly like its ``InsertBatch``. Shim for
    dialect parity and audit-log comparison only (see
    :func:`insert_header`)."""
    width = len(names)
    if width == 0 or not values or len(values) % width:
        # the reference never feeds these shapes (its reader always
        # sends full non-empty rows); emitting a dangling ')' or a
        # short tuple would be silently-wrong SQL
        raise ValueError(
            f"values (len {len(values)}) must be a non-empty multiple of "
            f"names (len {width})"
        )
    sql = insert_header(target, names)
    parts = []
    for i, v in enumerate(values):
        col = i % width
        if col == 0:
            parts.append("(" if i == 0 else "),(")
        else:
            parts.append(",")
        parts.append(render_insert_literal(tags[col], v))
    return len(values) // width, sql + "".join(parts) + ")"
