"""Declarative data-quality constraint suite (Deequ-style).

The reference profiles columns descriptively (`StatsPojo.java` counts
nulls/types but never judges them); production profilers pair that with a
*verification* layer: the user declares constraints (not-null, unique,
range, regex, allowed set) and the engine evaluates ALL of them in one
distributed pass and emits a pass/fail report. This is the same
fold-everything-into-one-agg design as `operators/profile.py` — each rule
becomes one conditional-count expression in a single `agg()`, so the
whole suite costs one table scan with map-side partial aggregation and a
1-row final exchange regardless of rule count.

Scale notes (100 TB): row-local rules (not_null / in_range / matches /
in_set) are pure codegen conditional counts — no shuffle beyond the
1-row aggregate. `unique` rules add an exact `count_distinct`, which
Spark plans as Expand + partial-distinct aggregation (one shuffle keyed
by the value, mergeable partials — never a driver-side set); at
vocabulary-scale columns swap in `approx_count_distinct` the same way
`operators/extras.distinct_counts` auto-routes to HLL++.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rule tuples: ("not_null", col) | ("unique", col)
#:   | ("in_range", col, lo, hi) | ("matches", col, regex)
#:   | ("in_set", col, (v1, v2, ...))
Rule = tuple


def _violation_expr(rule: Rule) -> Column:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return F.count(F.when(c.isNull(), F.lit(1)))
    if kind == "unique":
        # extra occurrences beyond the first of each value; NULLs are not
        # values (count(col) skips them on both engines)
        return F.count(c) - F.count_distinct(c)
    if kind == "in_range":
        lo, hi = rule[2], rule[3]
        return F.count(F.when(~c.between(F.lit(lo), F.lit(hi)), F.lit(1)))
    if kind == "matches":
        return F.count(F.when(c.isNotNull() & ~c.rlike(rule[2]), F.lit(1)))
    if kind == "in_set":
        return F.count(F.when(c.isNotNull() & ~c.isin(list(rule[2])),
                              F.lit(1)))
    raise ValueError(f"unknown constraint kind: {kind!r}")


def rule_label(rule: Rule) -> str:
    kind = rule[0]
    if kind == "in_range":
        return f"in_range[{rule[2]},{rule[3]}]"
    if kind == "matches":
        return f"matches[{rule[2]}]"
    if kind == "in_set":
        return "in_set[" + ",".join(str(v) for v in rule[2]) + "]"
    return kind


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate a declared constraint suite in ONE aggregation pass.

    Returns (rule, column, n_rows, n_violations, passed) — one row per
    declared rule, in declaration order. `n_rows` is the full row count
    (the denominator a report would use); NULL values only violate
    `not_null` — range/regex/set rules judge present values, the Deequ
    convention, so each data issue is reported exactly once."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [_violation_expr(r).alias(f"__v{i}")
             for i, r in enumerate(rules)]
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n"])
    out = [(rule_label(r), r[1], n, int(row[f"__v{i}"]),
            bool(row[f"__v{i}"] == 0))
           for i, r in enumerate(rules)]
    return df.sparkSession.createDataFrame(
        out, "rule string, column string, n_rows bigint, "
             "n_violations bigint, passed boolean")


def check_constraints_by(df: DataFrame, rules: list[Rule],
                         group_col: str) -> DataFrame:
    """Per-segment constraint report: the same declarative rule suite
    evaluated PER GROUP — (group, rule, column, n_rows, n_violations,
    passed) — the which-source-is-dirty view that turns a failing
    corpus-level check into an actionable upstream ticket.

    ONE grouped aggregation pass (the conditional-count expressions ride
    a groupBy instead of a global agg); `unique` rules become per-group
    exact count_distincts. Output is bounded by groups x rules; the
    melt from wide aggregate columns to rule rows happens on that
    bounded frame, never on data."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [_violation_expr(r).alias(f"__v{i}")
             for i, r in enumerate(rules)]
    g = df.groupBy(F.col(group_col).alias("group")).agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(rule_label(r)).alias("rule"),
                 F.lit(r[1]).alias("column"),
                 F.col(f"__v{i}").alias("n_violations"))
        for i, r in enumerate(rules)])
    return (g.select("group", F.col("__n").alias("n_rows"),
                     F.explode(rows).alias("r"))
            .select("group", F.col("r.rule").alias("rule"),
                    F.col("r.column").alias("column"), "n_rows",
                    F.col("r.n_violations").alias("n_violations"),
                    (F.col("r.n_violations") == 0).alias("passed")))
