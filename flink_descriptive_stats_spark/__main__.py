"""CLI entry point — the Spark-first analogue of the reference job's
``main()`` (ProfileJob.java:78-143: ParameterTool.fromArgs -> dataflow ->
console report).

    python -m flink_descriptive_stats_spark INPUT [options]

INPUT is a parquet/csv/json file or directory. Output is the S4-style
console report: per-column descriptive statistics, latent types, top-K
values/patterns, JB normality table, and row completeness.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m flink_descriptive_stats_spark",
        description="Single-pass distributed data profile of a table.")
    p.add_argument("input", help="parquet/csv/json path")
    p.add_argument("--format", default=None,
                   help="input format (default: inferred from extension)")
    p.add_argument("--columns", default=None,
                   help="comma-separated subset of columns to profile")
    p.add_argument("--no-topk", action="store_true",
                   help="skip the top-K values/patterns pass")
    p.add_argument("--master", default=None,
                   help="Spark master (default: local[$SPARK_GRAFT_CPUS])")
    return p


def infer_format(path: str) -> str:
    for ext in ("parquet", "csv", "json"):
        if path.rstrip("/").endswith("." + ext):
            return ext
    return "parquet"


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from flink_descriptive_stats_spark.operators import profile as prof
    from flink_descriptive_stats_spark.operators import topk
    from flink_descriptive_stats_spark.report import render_profile
    from flink_descriptive_stats_spark.session import get_spark

    spark = get_spark(app_name="profile-cli", master=args.master)
    fmt = args.format or infer_format(args.input)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = reader.format(fmt).load(args.input)
    cols = args.columns.split(",") if args.columns else None
    if cols:
        df = df.select(*cols)

    # cache: the profile agg and the top-K pass share one materialized scan
    df = df.cache()
    profile_df = prof.profile(df)
    # all-numeric tables have no token column to rank — skip, don't raise
    run_topk = not args.no_topk and topk.string_columns(df)
    topk_df = topk.topk_tokens(df) if run_topk else None
    complete_df = prof.complete_row_count(df)
    print(render_profile(profile_df, topk_df, complete_df))
    df.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
