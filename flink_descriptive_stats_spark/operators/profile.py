"""Whole-table single-pass profile (the engine's flagship operator).

Equivalent surface: the reference's entire ProfileJob dataflow
(ProfileJob.java:78-143) — per-column basic stats, string stats, latent-type
counters, plus the row-completeness side pipeline (RowStatsCollectHelper) —
but where the reference re-scans its source 1 + N_cols (+ 2 per string
column) times with a per-column pipeline fan-out (ProfileJob.java:94-113), we
compute EVERYTHING in one ``df.agg`` pass:

  parquet scan -> partial HashAggregate (per partition, codegen)
               -> 1-row exchange -> final HashAggregate -> tiny result

At 100 TB this is the optimal shape: one pass over the data, the only shuffle
moves a single row of ~30*N_cols doubles per partition, no skew possible.
Top-K frequent values/patterns (which genuinely need a grouped shuffle) live
in ``operators/topk.py`` as one separate multiplexed job.

Output: long format — one row per profiled column. Counts and min/max are
exact (BIGINT / DOUBLE); FP-derived statistics are '%.6e' strings (see
functions/sig.py for why).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_descriptive_stats_spark.functions import scalar
from flink_descriptive_stats_spark.functions.sig import sig6
from flink_descriptive_stats_spark.operators import moments

# Long-format output schema (name, type) — fixed order, every profile row.
PROFILE_FIELDS = [
    ("column", "string"), ("dtype", "string"),
    ("row_count", "bigint"), ("null_count", "bigint"),
    ("numeric_count", "bigint"), ("empty_count", "bigint"),
    ("min_val", "double"), ("max_val", "double"),
] + [(s, "string") for s in moments.DERIVED_STATS] + [
    ("min_len", "bigint"), ("max_len", "bigint"), ("avg_len", "string"),
    ("bool_count", "bigint"), ("int_count", "bigint"),
    ("long_count", "bigint"), ("float_count", "bigint"),
    ("double_count", "bigint"), ("date_count", "bigint"),
]


def completeness_expr(df: DataFrame) -> Column:
    """A16/S2: a row is "complete" iff every field is non-null and its string
    form is not blank (RowStatsCollectHelper.java:31-38). For non-string
    types the string form is never blank, so only string columns need the
    trim test — this keeps the predicate cheap and pushdown-friendly."""
    conds = []
    for f in df.schema.fields:
        c = F.col(f.name)
        cond = c.isNotNull()
        if isinstance(f.dataType, T.StringType):
            cond = cond & (F.trim(c) != "")
        conds.append(cond)
    out = conds[0]
    for cond in conds[1:]:
        out = out & cond
    return out


def _agg_exprs_for_column(i: int, name: str, dt: T.DataType) -> list[Column]:
    """The single-pass aggregate slots for one column (A1-A11)."""
    c = F.col(name)
    p = f"c{i}__"
    exprs = [F.count_if(c.isNull()).alias(f"{p}nulls")]

    x = scalar.numeric_expr(name, dt)
    if x is not None:
        exprs += moments.numeric_agg_exprs(x, p)

    ln = scalar.length_expr(name, dt)
    if ln is not None:
        exprs += [
            F.min(ln).cast("bigint").alias(f"{p}min_len"),
            F.max(ln).cast("bigint").alias(f"{p}max_len"),
            F.avg(ln).alias(f"{p}avg_len"),
        ]

    if isinstance(dt, T.StringType):
        # A4 empty strings + A11 latent-type counters. The reference's merge
        # loses the type counters across partitions (StatsPojo.java:101-155
        # never sums them — SURVEY.md §2.6 item 2); count_if sums correctly.
        exprs += [
            F.count_if(scalar.is_blank_expr(c)).alias(f"{p}empty"),
            F.count_if(scalar.parses_bool_expr(c)).alias(f"{p}bool_count"),
            F.count_if(scalar.parses_int_expr(c)).alias(f"{p}int_count"),
            F.count_if(scalar.parses_long_expr(c)).alias(f"{p}long_count"),
            F.count_if(scalar.parses_float_expr(c)).alias(f"{p}float_count"),
            F.count_if(scalar.parses_float_expr(c)).alias(f"{p}double_count"),
            F.count_if(scalar.parses_date_expr(c)).alias(f"{p}date_count"),
        ]
    return exprs


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile every (selected) column of ``df`` in one aggregation pass.

    Returns a long-format DataFrame, one row per column, schema
    ``PROFILE_FIELDS`` — deterministic row order by column position is NOT
    guaranteed by Spark, so downstream sorts by ``column`` where needed.
    """
    fields = [f for f in df.schema.fields
              if columns is None or f.name in columns]

    agg_exprs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    for i, f in enumerate(fields):
        agg_exprs += _agg_exprs_for_column(i, f.name, f.dataType)

    wide = df.agg(*agg_exprs)

    none_d = F.lit(None).cast("double")
    none_l = F.lit(None).cast("bigint")
    none_s = F.lit(None).cast("string")

    structs = []
    for i, f in enumerate(fields):
        p = f"c{i}__"
        has_numeric = scalar.numeric_expr(f.name, f.dataType) is not None
        has_len = scalar.length_expr(f.name, f.dataType) is not None
        is_str = isinstance(f.dataType, T.StringType)

        if has_numeric:
            n = F.col(f"{p}n")
            d = moments.derived_stats(
                n, F.col("row_count"), F.col(f"{p}mean"),
                F.col(f"{p}var_pop"), F.col(f"{p}var_samp"),
                F.col(f"{p}skew_raw"), F.col(f"{p}kurt_raw"))
            derived = [sig6(d[s]).alias(s) for s in moments.DERIVED_STATS]
            min_v, max_v = F.col(f"{p}min"), F.col(f"{p}max")
        else:
            n = F.lit(0).cast("bigint")
            derived = [none_s.alias(s) for s in moments.DERIVED_STATS]
            min_v, max_v = none_d, none_d

        struct_fields = [
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("dtype"),
            F.col("row_count").alias("row_count"),
            F.col(f"{p}nulls").alias("null_count"),
            n.alias("numeric_count"),
            (F.col(f"{p}empty") if is_str else none_l).alias("empty_count"),
            min_v.alias("min_val"), max_v.alias("max_val"),
            *derived,
            (F.col(f"{p}min_len") if has_len else none_l).alias("min_len"),
            (F.col(f"{p}max_len") if has_len else none_l).alias("max_len"),
            (sig6(F.col(f"{p}avg_len")) if has_len else none_s).alias("avg_len"),
        ]
        for cnt in ("bool_count", "int_count", "long_count",
                    "float_count", "double_count", "date_count"):
            struct_fields.append(
                (F.col(f"{p}{cnt}") if is_str else none_l).alias(cnt))
        structs.append(F.struct(*struct_fields))

    return (wide.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.*"))


def complete_row_count(df: DataFrame) -> DataFrame:
    """A16: count of rows with every field non-null and non-blank."""
    return df.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.count_if(completeness_expr(df)).alias("complete_count"),
    )
