from etl_pack_spark.operators.hashing import row_hash  # noqa: F401
from etl_pack_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    incremental_filter,
    snapshot_hashes,
)
