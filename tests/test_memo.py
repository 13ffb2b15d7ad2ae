"""functions/memo.py: repeat aggregate bundles over the same immutable
input hit the memo; different inputs or tags miss."""

from pyspark.sql import functions as F

from flink_descriptive_stats_spark.functions import memo


def test_agg_row_memoized_hits_and_misses(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    a = memo.agg_row_memoized(df, [F.avg("x").alias("m")], ("t1",))
    b = memo.agg_row_memoized(df, [F.avg("x").alias("m")], ("t1",))
    assert a is b                      # same plan + tag -> cached row
    c = memo.agg_row_memoized(df, [F.max("x").alias("m")], ("t2",))
    assert c is not a and c["m"] == 3.0
    other = spark.createDataFrame([(9.0,)], "x double")
    d = memo.agg_row_memoized(other, [F.avg("x").alias("m")], ("t1",))
    assert d["m"] == 9.0               # different input -> different row


def test_cluster_memo_reuse(spark):
    from flink_descriptive_stats_spark.operators import dedup
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "unrelated text here")],
        "doc_id long, text string")
    a = dedup.neardup_clusters(df)
    b = dedup.neardup_clusters(df)
    assert a is b                      # checkpointed labels reused
    rows = sorted(map(tuple, b.collect()))
    assert rows == [(0, 0), (1, 0), (2, 2)]
