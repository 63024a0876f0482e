"""JDBC source (ops S1/S2/S3 against live MySQL/ClickHouse).

The reference reads MySQL via pooled database/sql (mysql/mysql.go:36-70)
and ClickHouse via HTTP+FORMAT JSON (clickhouse/clickhouse.go:29-80),
parallelized by OFFSET pagination (mysql/reader/main.go:158-171).
Spark's JDBC source replaces all of that: predicate + projection push
down into the remote SQL, and ``partitionColumn/lowerBound/upperBound/
numPartitions`` give linear-work parallel range scans instead of
quadratic OFFSET pages.

No database is reachable in the test container, so this module only
*builds* the reader (pure plan construction) — unit tests assert the
option plumbing; live use just calls ``.load()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.readwriter import DataFrameReader

# jdbc:mysql://… and jdbc:clickhouse://… both ride the same code path;
# dialect-specific type mapping is the JDBC driver's job (SURVEY §1.3).


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: object | None = None,
    upper_bound: object | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    query: str | None = None,
) -> DataFrameReader:
    """Construct the partitioned JDBC reader (S3 without OFFSET).

    ``num_partitions`` replaces the reference's ``-workers`` flag
    (mysql/reader/main.go:33) and ``fetch_size`` its ``-batch`` page
    size (mysql/reader/main.go:31), but as cursor batching rather than
    re-issued LIMIT queries.
    """
    reader = spark.read.format("jdbc").option("url", url).option("fetchsize", str(fetch_size))
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned JDBC read needs lower_bound, upper_bound, num_partitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader


def jdbc_read(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    """Load a JDBC table (live environments only)."""
    return jdbc_reader(spark, url, table, **kwargs).load()


def snapshot_query(
    fields: str,
    table: str,
    cursor: str | None = None,
    cursor_min: str | None = None,
    cursor_max: str | None = None,
) -> str:
    """Remote snapshot SQL for the JDBC ``query`` option — the exact
    string shape the reference's writer-side generator emits
    (``mysql/writer/main.go`` ``createSnapshotQuery``, golden-pinned at
    ``mysql/writer/main_test.go:109-149`` including its trailing-space
    quirk on the unfiltered form), so a reference deployment's remote
    SQL audit logs line up verbatim. ``cursor_min``/``cursor_max`` are
    passed through as dialect EXPRESSIONS (``STR_TO_DATE(...)``,
    ``toDate(...)``/``today()``), not quoted values — that is the
    reference's contract and what lets each dialect's date functions
    ride through unescaped."""
    where = (
        f"WHERE {cursor} BETWEEN {cursor_min} AND {cursor_max}" if cursor else ""
    )
    return f"SELECT {fields} FROM {table} {where}"


def page_query(
    fields: str,
    table: str,
    cursor: str | None = None,
    cursor_min: str | None = None,
    cursor_max: str | None = None,
    order_by: str | None = None,
    offset: int = 0,
    limit: int = 1000,
) -> str:
    """The reference reader's OFFSET-paginated SQL, string-exact
    (``mysql/reader/main.go`` ``sqlGenerator``, golden-pinned at
    ``mysql/reader/main_test.go:8-87`` — including the double/triple
    spaces its empty clause slots leave behind). Kept as a dialect pin
    and migration shim ONLY: ``OFFSET n`` makes the database re-walk n
    rows per page (quadratic total work), which is exactly what the
    partitioned range read in :func:`jdbc_reader` replaces (SURVEY
    §7.4) — new code should never page."""
    where = (
        f"WHERE {cursor} BETWEEN {cursor_min} AND {cursor_max}" if cursor else ""
    )
    order = f"ORDER BY {order_by}" if order_by else ""
    return f"SELECT {fields} FROM {table} {where} {order} LIMIT {offset}, {limit}"
