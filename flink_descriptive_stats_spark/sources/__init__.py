from flink_descriptive_stats_spark.sources.tables import load_table  # noqa: F401
