"""Evidence plans for the adaptive-spread change (optimization r13).

For each touched query the meaningful plan is the INNER computational
frame (the query itself returns a driver-built rows frame), so this dumps
the inner aggregate/projection plan twice: once with spread() active
(after) and once with it monkeypatched to identity (before == the
pre-change plan, every other code path identical). Run at sf0.1 so the
adaptive guard fires exactly as the bench sees it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
OUT = "/root/repo/plans/r13"


def fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    from pyspark.sql import functions as F

    from flink_descriptive_stats_spark.functions import spread as spread_mod
    from flink_descriptive_stats_spark.operators import extras
    from flink_descriptive_stats_spark.operators import profile as prof
    from flink_descriptive_stats_spark.session import get_spark
    from flink_descriptive_stats_spark.sources.tables import load_table

    spark = get_spark(app_name="dump_spread_plans")
    li = load_table(spark, SF, "lineitem")
    docs = load_table(spark, SF, "documents")

    def profile_agg(d):
        aggs = [F.count(F.lit(1)).alias("row_count")]
        for i, f in enumerate(d.schema.fields):
            aggs += prof._agg_exprs_for_column(i, f.name, f.dataType)
        from flink_descriptive_stats_spark.functions.spread import (
            SPREAD_MIN_BYTES, spread)
        return spread(d, min_bytes=SPREAD_MIN_BYTES).agg(*aggs)

    def stats_agg(d):
        cols = extras.numeric_columns(d)
        from flink_descriptive_stats_spark.functions.spread import (
            SPREAD_MIN_BYTES, spread)
        arr = F.array(*[F.lit(p) for p in extras.QUARTILES])
        dd = spread(d.select(*cols), cols, min_bytes=SPREAD_MIN_BYTES)
        return dd.agg(
            *([F.percentile(F.col(c), arr).alias(f"{c}__q") for c in cols]
              + [F.avg(F.col(c)).alias(f"{c}__mu") for c in cols]
              + [F.stddev_pop(F.col(c)).alias(f"{c}__sd") for c in cols]))

    def schema_sugg_agg(d):
        # the gated query's derived stringified frame
        sd = d.select(*[F.col(c).cast("string").alias(c)
                        for c in ("l_quantity", "l_shipdate",
                                  "l_linestatus", "l_orderkey")])
        from flink_descriptive_stats_spark.functions import scalar
        from flink_descriptive_stats_spark.functions.spread import (
            SPREAD_MIN_BYTES, spread)
        sd = spread(sd, min_bytes=SPREAD_MIN_BYTES)
        aggs = []
        for c in sd.columns:
            x = F.col(c)
            aggs += [F.count(x).alias(f"{c}__n"),
                     F.count_if(scalar.parses_bool_expr(x))
                     .alias(f"{c}__bool")]
        return sd.agg(*aggs)

    def card_per(d):
        from flink_descriptive_stats_spark.functions.spread import spread
        from flink_descriptive_stats_spark.operators.dedup import \
            _canonical_expr
        from flink_descriptive_stats_spark.operators.text import (
            _lang_scores, _predicted_lang_expr, pii_exprs, text_stats_exprs)
        c = F.col("text")
        narrow = spread(d.where(c.isNotNull()).select("text", "source"))
        return narrow.select(
            F.md5(c).alias("__h"),
            F.md5(_canonical_expr("text")).alias("__hc"),
            F.col("source").alias("__src"),
            _predicted_lang_expr(_lang_scores(c)).alias("__lang"),
            *text_stats_exprs("text"), *pii_exprs("text"))

    frames = {
        "profile_lineitem": lambda: profile_agg(li),
        "quartiles_lineitem": lambda: stats_agg(li),
        "schema_suggestions_lineitem": lambda: schema_sugg_agg(li),
        "dataset_card_documents": lambda: card_per(docs),
    }

    real_spread = spread_mod.spread
    for name, build in frames.items():
        spread_mod.spread = real_spread
        after = fmt(build())
        spread_mod.spread = lambda df, cols=None, min_bytes=0: df
        before = fmt(build())
        spread_mod.spread = real_spread
        for suffix, plan in (("before", before), ("after", after)):
            with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
        print(f"{name}: before Exchanges="
              f"{before.count('Exchange ')} after={after.count('Exchange ')}")


if __name__ == "__main__":
    main()
