from etl_pack_spark.sinks.writers import (  # noqa: F401
    WriteResult,
    append_table,
    jdbc_writer,
    write_sink,
)
from etl_pack_spark.sinks.compaction import (  # noqa: F401
    CompactionStats,
    compact,
    compact_zorder,
    zorder_key,
)
from etl_pack_spark.sinks.sharding import (  # noqa: F401
    shard_assign,
    shard_assign_sql,
    write_shuffled_shards,
)
