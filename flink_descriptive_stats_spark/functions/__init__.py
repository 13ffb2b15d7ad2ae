from flink_descriptive_stats_spark.functions import scalar, sig  # noqa: F401
