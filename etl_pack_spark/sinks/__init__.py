from etl_pack_spark.sinks.writers import append_table, jdbc_writer, WriteResult  # noqa: F401
