from etl_pack_spark.streaming.incremental import (  # noqa: F401
    stream_cdc_apply,
    stream_incremental_transfer,
    stream_transfer,
    windowed_event_counts,
)
