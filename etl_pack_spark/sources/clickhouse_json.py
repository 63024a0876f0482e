"""ClickHouse HTTP ``FORMAT JSON`` response decoding, engine-side.

The reference reads ClickHouse over HTTP: it appends ``FORMAT JSON``
to SELECTs and decodes the ``{"meta": [{name, type}...], "data":
[{col: val}...]}`` body into its Batch (``clickhouse/clickhouse.go:
37-41`` query shaping, ``:69-77`` decode, ``:90-124`` convert/
flatMeta), collapsing unknown type tags to string
(``clickhouse/types/types.go`` ``Update``) and re-rendering DateTime
values (``ToUniversal``). No real ClickHouse server is reachable in
this environment, but BOTH halves run and are tested: the decode
against captured/golden response bodies, and the transport
(:func:`clickhouse_http_query` — POST + basic auth + ``FORMAT JSON``
append, ``clickhouse.go:29-79`` semantics-exact) against an in-test
loopback HTTP fixture server (tests/test_sources.py).

Scale shape: one response body is one page (the reference pages with
``LIMIT offset, n``; here pages come from partitioned range reads —
``sources/jdbc.py``). :func:`clickhouse_json_to_df` parses ONE page
driver-side (useful for tests and small control queries);
:func:`clickhouse_json_pages` parses MANY pages as an Arrow-batched
``mapInPandas`` stage — bodies fetched per partition are decoded on
executors, so the driver never sees row data.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from etl_pack_spark.schema import (
    CLICKHOUSE_TO_UNIVERSAL,
    normalize_type_tags,
    universal_struct,
)

_CH_DT_FMT = "%Y-%m-%d %H:%M:%S"  # clickhouse/types/types.go:27


def _coerce(value, tag: str):
    """One JSON cell → the Python value for its universal tag.

    Mirrors the reference's value path: DateTime strings re-parse
    (``ToUniversal``), everything else passes through, and any value
    under an UNKNOWN tag is stringified (its ``fmt.Sprint`` collapse —
    non-scalar JSON values render as compact JSON here, the one
    deliberate divergence from Go's ``fmt`` rendering)."""
    if value is None:
        return None
    if tag == "datetime":
        return _dt.datetime.strptime(str(value), _CH_DT_FMT)
    if tag == "date":
        return _dt.date.fromisoformat(str(value))
    if tag == "uint64":
        return _dec.Decimal(str(value))
    if tag in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32"):
        return int(value)
    if tag in ("float32", "float64"):
        return float(value)
    return _render_unknown(value)


def _render_unknown(value):
    """fmt.Sprint-compatible stringification for values under UNKNOWN
    type tags: JSON booleans render lowercase like Go's, scalars pass
    through, and non-scalars render as compact JSON (the one
    deliberate divergence from Go's ``fmt`` rendering)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (dict, list)):
        return json.dumps(value, separators=(",", ":"))
    return str(value)


def parse_meta(payload) -> tuple[list[str], list[str]]:
    """(names, universal tags) from a response body — ``flatMeta`` +
    the unknown→string collapse."""
    obj = payload if isinstance(payload, dict) else json.loads(payload)
    meta = obj.get("meta", [])
    names = [m["name"] for m in meta]
    tags = normalize_type_tags(
        [m["type"] for m in meta], CLICKHOUSE_TO_UNIVERSAL
    )
    return names, tags


def clickhouse_json_to_df(spark: SparkSession, payload) -> DataFrame:
    """ONE ``FORMAT JSON`` body → a typed DataFrame (driver-side
    parse; for many pages use :func:`clickhouse_json_pages`)."""
    obj = payload if isinstance(payload, dict) else json.loads(payload)
    names, tags = parse_meta(obj)
    schema = universal_struct(names, tags)
    rows = [
        tuple(_coerce(r.get(n), t) for n, t in zip(names, tags))
        for r in obj.get("data", [])
    ]
    return spark.createDataFrame(rows, schema)


def clickhouse_json_pages(
    bodies: DataFrame,
    names: list[str],
    ch_types: list[str],
    body_col: str = "body",
) -> DataFrame:
    """MANY response pages → one typed DataFrame, decoded on the
    executors: ``bodies`` carries one ``FORMAT JSON`` body per row
    (however they were fetched — one per partition/range), and each
    Arrow batch of bodies parses in place. ``names``/``ch_types`` are
    the expected meta (all pages of one query share it); a page whose
    meta disagrees raises rather than silently mis-mapping columns.
    """
    import pandas as pd

    from etl_pack_spark.sources.reader import ensure_session_confs

    # the decode closure references module-level helpers (parse_meta,
    # the dialect dicts), so executors must be able to import the
    # package — ship it, like read_table does, instead of requiring a
    # get_spark-created session
    ensure_session_confs(bodies.sparkSession)

    tags = normalize_type_tags(ch_types, CLICKHOUSE_TO_UNIVERSAL)
    schema = universal_struct(names, tags)
    int_tags = {"int8", "int16", "int32", "int64", "uint8", "uint16", "uint32"}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for body in pdf[body_col]:
                if body is None:
                    # a NULL body means an upstream fetch failure —
                    # dropping the page silently would hand consumers
                    # an incomplete corpus with zero diagnostics
                    raise ValueError("NULL response body (failed fetch?)")
                obj = json.loads(body)
                got = parse_meta(obj)
                if got != (names, tags):
                    raise ValueError(
                        f"page meta {got} != expected {(names, tags)}"
                    )
                # dtype=object: the default constructor infers float64
                # for a bare-int column containing NULLs (quote_64bit=0
                # servers), corrupting int64 values beyond 2^53 BEFORE
                # the typed per-column coercion below can see them
                frames.append(
                    pd.DataFrame(
                        obj.get("data", []), columns=names, dtype=object
                    )
                )
            page = (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(columns=names)
            )
            # COLUMN-WISE coercion (vectorized pandas passes, not a
            # per-cell Python loop — this is the scale path)
            for n, t in zip(names, tags):
                col = page[n]
                if t == "datetime":
                    page[n] = pd.to_datetime(col, format=_CH_DT_FMT)
                elif t == "date":
                    page[n] = pd.to_datetime(col).dt.date
                elif t == "uint64":
                    page[n] = col.map(
                        lambda v: None if pd.isna(v) else _dec.Decimal(str(v))
                    )
                elif t == "int64":
                    # ClickHouse quotes 64-bit ints as JSON strings by
                    # default (output_format_json_quote_64bit_integers=1)
                    # — astype('Int64') on strings raises, and
                    # pd.to_numeric routes through float64 when NULLs
                    # are present, corrupting values beyond 2^53. Exact
                    # per-cell int() (driver _coerce parity; the uint64
                    # Decimal path beside it is per-cell for the same
                    # reason).
                    # (Series.map would infer float64 for int+None
                    # results — pd.array keeps python-int precision)
                    # pd.isna, not `is None`: a bare-int column with
                    # NULLs arrives float64 with NaN (quote_64bit=0
                    # servers), and int(NaN) raises
                    page[n] = pd.array(
                        [None if pd.isna(v) else int(v) for v in col],
                        dtype="Int64",
                    )
                elif t in int_tags:
                    # narrow ints arrive bare, but accept quoted forms
                    # too; values < 2^32 survive the float64 routing
                    page[n] = pd.to_numeric(col).astype("Int64")
                elif t in ("float32", "float64"):
                    page[n] = col.astype("float64")
                else:
                    page[n] = col.map(
                        lambda v: None if v is None else _render_unknown(v)
                    )
            yield page

    return bodies.select(body_col).mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# HTTP transport (the reference's wire path, clickhouse/clickhouse.go)
# ---------------------------------------------------------------------------

def _build_http_query():
    """Factory for the transport impl: the returned NESTED function is
    cloudpickled by value into executor-side kernels, so any session
    can run the fetch stage without importing this package on workers
    (same posture as the similarity/quantize kernels)."""

    def impl(
        address: str,
        query: str,
        user: str = "",
        password: str = "",
        timeout: float = 30.0,
    ):
        import base64
        import urllib.error
        import urllib.request

        q = query.strip()
        is_read = q.startswith("SELECT")
        if is_read:
            q += " FORMAT JSON"
        req = urllib.request.Request(
            address, data=q.encode("utf-8"), method="POST"
        )
        token = base64.b64encode(
            f"{user}:{password}".encode("utf-8")
        ).decode("ascii")
        req.add_header("Authorization", f"Basic {token}")
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                body = resp.read()
        except urllib.error.HTTPError as e:
            raise ValueError(e.read().decode("utf-8", "replace"))
        return body.decode("utf-8") if is_read else None

    return impl


def clickhouse_http_query(
    address: str,
    query: str,
    user: str = "",
    password: str = "",
    timeout: float = 30.0,
) -> str | None:
    """The reference's ClickHouse HTTP transport, semantics-exact
    (``clickhouse/clickhouse.go:29-79``): POST the query text as the
    body, basic auth, ``" FORMAT JSON"`` appended to trimmed queries
    that start with SELECT; a non-200 response surfaces the response
    BODY as the error (ClickHouse puts its error message there); the
    decoded body is returned for SELECTs, ``None`` for writes/DDL
    (the reference parses only read responses). stdlib urllib — no
    client library dependency."""
    return _build_http_query()(address, query, user, password, timeout)


def clickhouse_fetch_pages(
    spark: SparkSession,
    address: str,
    queries: list[str],
    user: str = "",
    password: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fetch MANY page queries as a distributed bodies frame (one
    ``FORMAT JSON`` body per row) — each partition's queries are
    POSTed from the executor that owns them, so page payloads never
    route through the driver. Feed the result to
    :func:`clickhouse_json_pages` for the Arrow-batched decode.

    The page queries themselves typically come from
    ``sources.jdbc.page_query`` (the reference generator's exact
    strings); at scale prefer partitioned range reads
    (``sources/jdbc.py``) — this is the wire-parity path.

    Every query must be one the transport treats as a READ (trimmed,
    ``SELECT``-prefixed, case-sensitive — the reference's exact rule,
    ``clickhouse.go:44-46``): anything else returns no body, which
    would surface here as NULL ``body`` rows that break the downstream
    JSON decode with no indication of the cause — so it is rejected
    up front instead."""
    import pandas as pd

    for q in queries:
        if not q.strip().startswith("SELECT"):
            raise ValueError(
                "clickhouse_fetch_pages requires SELECT-prefixed read "
                "queries (the transport's case-sensitive reference rule "
                f"treats anything else as a write, returning no body): {q!r}"
            )

    http_query = _build_http_query()  # nested fn: pickled by value

    def fetch(batches):
        for pdf in batches:
            bodies = [
                http_query(address, q, user, password) for q in pdf["query"]
            ]
            yield pd.DataFrame({"page": pdf["page"], "body": bodies})

    rows = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)], "page int, query string"
    )
    if num_partitions:
        rows = rows.repartition(num_partitions)
    return rows.mapInPandas(fetch, schema="page int, body string")
