from etl_pack_spark.plans.transfer import TransferConfig, run_transfer  # noqa: F401
