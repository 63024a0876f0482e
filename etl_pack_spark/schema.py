"""Universal scalar type system and schema normalization (ops T1/T2).

The reference moves every value through a small "universal" type hub —
``int8..64, uint8..64, float32/64, date, datetime, string`` declared in
``contract/contract.proto:32-38`` — with per-connector dialect dicts
(``mysql/types/types.go:9-14``, ``clickhouse/types/types.go:9-21``) and
an unknown-type → ``string`` fallback. Values themselves travel as
strings and only datetimes are rewritten
(``mysql/types/types.go:17-28``: ``"2006-01-02 15:04:05"`` → RFC3339,
invalid datetime = hard error).

Here the hub is Spark's native type system: data is binary/typed end to
end (Tungsten), so T3's literal re-rendering is unnecessary, and
"normalization" is a cast plan Catalyst folds into the scan.

Deliberate deltas from the reference, documented per SURVEY §7.4:
  * Unsigned ints (no Spark equivalent) widen to the next signed type;
    ``uint64`` → ``DecimalType(20, 0)``.
  * ``float34`` in the proto comment is the reference's typo for
    ``float32`` (its own tests use float32, clickhouse/types/types_test.go:114).
  * Invalid datetimes: the reference aborts the batch. Spark's cast
    yields NULL; ``strict=True`` reproduces abort-on-bad-value via ANSI
    try_cast + a validity check, ``quarantine=True`` splits bad rows
    into a side output instead (the scale-friendly choice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Universal → Spark type mapping (contract.proto:32-38)
# ---------------------------------------------------------------------------

UNIVERSAL_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # unsigned: widen (Spark has no unsigned integral types)
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float32": T.FloatType(),
    "float34": T.FloatType(),  # reference typo for float32 (see module doc)
    "float64": T.DoubleType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "string": T.StringType(),
}

# Dialect dicts — source-native type tag → universal tag.
# MySQL (mysql/types/types.go:9-14): only four tags mapped, rest → string.
MYSQL_TO_UNIVERSAL: dict[str, str] = {
    "DATETIME": "datetime",
    "INT": "int64",
    "DATE": "date",
    "TEXT": "string",
}

# ClickHouse (clickhouse/types/types.go:9-21).
CLICKHOUSE_TO_UNIVERSAL: dict[str, str] = {
    "DateTime": "datetime",
    "Date": "date",
    "String": "string",
    "Int8": "int8",
    "Int16": "int16",
    "Int32": "int32",
    "Int64": "int64",
    "UInt8": "uint8",
    "UInt16": "uint16",
    "UInt32": "uint32",
    "UInt64": "uint64",
    "Float32": "float32",
    "Float64": "float64",
}

# The reference's source datetime wire format (mysql/types/types.go:10).
SOURCE_DATETIME_FMT = "yyyy-MM-dd HH:mm:ss"


def normalize_type_tags(tags: list[str], dialect: dict[str, str]) -> list[str]:
    """T2: rewrite source type tags to universal tags, unknown → string
    (mysql/types/types.go:31-39)."""
    return [dialect.get(t, "string") for t in tags]


def universal_struct(names: list[str], tags: list[str]) -> T.StructType:
    """Build a Spark schema from parallel (names, universal tags) lists —
    the Batch header of contract.proto:29-39 as a StructType."""
    return T.StructType(
        [T.StructField(n, UNIVERSAL_TO_SPARK.get(t, T.StringType()), True)
         for n, t in zip(names, tags)]
    )


def to_universal_datetime(col: Column, strict: bool = False) -> Column:
    """T1 value conversion: parse the reference's source datetime format.

    ``strict`` mirrors the reference's abort-on-invalid behavior
    (mysql/types/types.go:21-23) by raising at execution time via an
    assertion expression; default (non-strict) yields NULL like plain
    Spark casts, which composes with :func:`quarantine_invalid`.
    """
    if strict:
        # try_to_timestamp + explicit raise_error: aborts the batch on
        # any unparseable non-null input REGARDLESS of the session's
        # spark.sql.ansi.enabled (a bare ANSI to_timestamp silently
        # yields NULLs on an ANSI-off caller session).
        parsed = F.try_to_timestamp(col, F.lit(SOURCE_DATETIME_FMT))
        return F.when(
            col.isNotNull() & parsed.isNull(),
            F.raise_error(F.concat(F.lit("invalid datetime for strict parse: "), col)),
        ).otherwise(parsed)
    return F.try_to_timestamp(col, F.lit(SOURCE_DATETIME_FMT))


def normalize_schema(
    df: DataFrame,
    tags: dict[str, str],
    dialect: dict[str, str] | None = None,
) -> DataFrame:
    """T1+T2 over a whole DataFrame: cast each named column to its
    (universal-tagged) Spark type. ``tags`` maps column → type tag,
    either already-universal or source-dialect (pass ``dialect``).

    The casts are Catalyst expressions: for parquet/JDBC sources they
    fold into the scan projection, so normalization costs nothing extra
    at 100 TB — no second pass, no row-at-a-time conversion loop (the
    reference converts every cell in Go, mysql/mysql.go:107-119).
    """
    if dialect is not None:
        tags = {c: dialect.get(t, "string") for c, t in tags.items()}
    out = []
    for field in df.schema.fields:
        tag = tags.get(field.name)
        if tag is None:
            out.append(F.col(field.name))
            continue
        target = UNIVERSAL_TO_SPARK.get(tag, T.StringType())
        if isinstance(target, T.TimestampType) and isinstance(field.dataType, T.StringType):
            out.append(to_universal_datetime(F.col(field.name)).alias(field.name))
        else:
            out.append(F.col(field.name).cast(target).alias(field.name))
    return df.select(*out)


def quarantine_invalid(
    df: DataFrame, col: str, fmt: str = SOURCE_DATETIME_FMT
) -> tuple[DataFrame, DataFrame]:
    """Split rows whose string datetime fails to parse into a side
    output instead of aborting the batch (scale-friendly variant of the
    reference's hard error, mysql/mysql_test.go:32-38).

    Returns ``(valid_with_parsed_col, quarantined_original_rows)``.
    """
    parsed = F.try_to_timestamp(F.col(col), F.lit(fmt))
    bad = F.col(col).isNotNull() & parsed.isNull()
    valid = df.where(~bad | F.col(col).isNull()).withColumn(col, parsed)
    quarantined = df.where(bad)
    return valid, quarantined
