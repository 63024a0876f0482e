from etl_pack_spark.sources.reader import ReadSpec, read_table, windowed_read  # noqa: F401
from etl_pack_spark.sources.jdbc import jdbc_read  # noqa: F401
