"""Windowed / streaming profile (the BASELINE.json north star).

The reference is batch-only (Flink DataSet API, ProfileJob.java:81); its
aggregation state is nevertheless an algebraic mergeable monoid — which is
exactly what Structured Streaming's incremental state update needs. So the
same aggregate bundle runs under ``groupBy(window(ts, ...))`` unchanged:

- batch DataFrame  -> per-window profile (oracle-checkable via time_bucket)
- streaming DataFrame (readStream) -> identical code path, plus
  ``withWatermark`` for bounded state / late-data drop

Window kinds: tumbling (slide=None), sliding (slide given), session
(gap given -> session_window). Derived stats use the *expression* form
(moments.derived_stats) because there is one result row per window — the
driver-side shortcut used by the batch profile does not apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.functions.sig import sig6
from flink_descriptive_stats_spark.operators import moments

# Derived stats exposed per window — kept to the core set so the per-window
# expression tree stays comfortably inside codegen limits.
WINDOW_STATS = ("mean", "var_pop", "var_samp", "stddev_pop", "stddev_samp",
                "skew_pop", "skew_samp", "kurt_pop", "kurt_samp", "jb_score")


def windowed_profile(df: DataFrame, ts_col: str = "ts",
                     value_col: str = "value",
                     window: str = "6 hours",
                     slide: str | None = None,
                     session_gap: str | None = None,
                     watermark: str | None = None,
                     extra_keys: list[str] | None = None) -> DataFrame:
    """Per-window numeric profile of ``value_col``. Works on both batch and
    streaming DataFrames (same plan; streaming adds incremental state)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    if session_gap:
        win: Column = F.session_window(F.col(ts_col), session_gap)
    elif slide:
        win = F.window(F.col(ts_col), window, slide)
    else:
        win = F.window(F.col(ts_col), window)

    x = F.col(value_col).cast("double")
    keys = [win.alias("win")] + [F.col(k) for k in (extra_keys or [])]
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("row_count"),
        F.count_if(x.isNull()).alias("null_count"),
        *moments.numeric_agg_exprs(x, ""),
    )

    d = moments.derived_stats(F.col("n"), F.col("row_count"), F.col("mean"),
                              F.col("var_pop"), F.col("var_samp"),
                              F.col("skew_raw"), F.col("kurt_raw"))
    out = [F.col("win.start").alias("window_start"),
           F.col("win.end").alias("window_end"),
           *[F.col(k) for k in (extra_keys or [])],
           F.col("row_count"), F.col("null_count"),
           F.col("n").alias("numeric_count"),
           F.col("min").alias("min_val"), F.col("max").alias("max_val"),
           *[sig6(d[s]).alias(s) for s in WINDOW_STATS]]
    return agg.select(*out)


def grouped_profile(df: DataFrame, keys: list[str],
                    value_col: str = "value") -> DataFrame:
    """The windowed profile's aggregate bundle keyed by arbitrary dimension
    columns instead of a time window — per-group numeric profile in one
    partial+final aggregation pass (grouped analogue of the reference's
    whole-column profile; same moments, same derived statistics)."""
    x = F.col(value_col).cast("double")
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("row_count"),
        F.count_if(x.isNull()).alias("null_count"),
        *moments.numeric_agg_exprs(x, ""),
    )
    d = moments.derived_stats(F.col("n"), F.col("row_count"), F.col("mean"),
                              F.col("var_pop"), F.col("var_samp"),
                              F.col("skew_raw"), F.col("kurt_raw"))
    return agg.select(
        *[F.col(k) for k in keys],
        F.col("row_count"), F.col("null_count"),
        F.col("n").alias("numeric_count"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
        *[sig6(d[s]).alias(s) for s in WINDOW_STATS])


def streaming_windowed_profile(spark, source_dir: str, schema,
                               ts_col: str = "ts", value_col: str = "value",
                               window: str = "6 hours",
                               watermark: str = "1 hour",
                               **kwargs) -> DataFrame:
    """readStream(parquet dir) -> windowed profile. Caller attaches the sink
    (writeStream / foreachBatch)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return windowed_profile(stream, ts_col=ts_col, value_col=value_col,
                            window=window, watermark=watermark, **kwargs)
