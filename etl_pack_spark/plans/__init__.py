from etl_pack_spark.plans.merge import (  # noqa: F401
    apply_cdc,
    merge_upsert,
    scd2_build,
    scd2_merge,
    snapshot_diff,
    snapshot_diff_sql,
)
from etl_pack_spark.plans.curate import curate_corpus  # noqa: F401
from etl_pack_spark.plans.pretrain import prepare_pretraining_corpus  # noqa: F401
from etl_pack_spark.plans.transfer import TransferConfig, run_transfer  # noqa: F401
