"""Format-agnostic source layer (S1/S2 generalized).

The reference hard-codes two sources (MySQL text rows, ClickHouse
FORMAT JSON — mysql/mysql.go:36-70, clickhouse/clickhouse.go:29-80).
Spark's DataSource API makes the source a config choice; this module
normalizes the handful the engine supports behind one call so
``windowed_read``/``run_transfer`` compose with any of them.

CSV/JSON land with the same universal-type normalization rules as the
reference's text wire format: schema inference (or an explicit
universal-tag schema via :func:`etl_pack_spark.schema.universal_struct`)
plus the T1 datetime rewrite where a string column carries the
``yyyy-MM-dd HH:mm:ss`` wire format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pack_spark.schema import universal_struct

FORMATS = {"parquet", "orc", "csv", "json", "jdbc"}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema_tags: dict[str, str] | None = None,
    csv_header: bool = True,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Load ``path`` in the given format.

    ``schema_tags`` (column → universal type tag) pins an explicit
    schema — the scale-correct choice for text formats, where inference
    costs an extra full scan of the data.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(FORMATS)}")
    if fmt == "jdbc":
        raise ValueError("use etl_pack_spark.sources.jdbc.jdbc_read for jdbc")

    reader = spark.read
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema_tags is not None:
        reader = reader.schema(universal_struct(list(schema_tags), list(schema_tags.values())))
    if fmt == "csv":
        reader = reader.option("header", str(csv_header).lower())
        if schema_tags is None:
            reader = reader.option("inferSchema", "true")
        return reader.csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "orc":
        # columnar like parquet: same pushdown/pruning behavior
        return reader.orc(path)
    return reader.parquet(path)
