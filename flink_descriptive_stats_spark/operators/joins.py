"""Temporal join operators Spark's DataFrame API lacks as primitives.

``asof_join``: for every left row, attach the latest right row whose
timestamp is <= the left row's, within the same key group (the
point-in-time join of feature stores and market data; "backward"
direction). The reference has no joins at all (it is a single-table
profiler), but a training-data pipeline attaching slowly-changing
metadata or latest-marker events needs this constantly.

Implementation is a composition of built-in operators — the union trick:
tag left rows side=1 and right rows side=0, union them on the common
(key, ts) spine, sort each key group once, and carry the right payload
forward with ``last(ignorenulls=True)`` over an unbounded-preceding
window. One shuffle keyed by the group column, one sort per group —
exactly the cost of a sort-merge join, with no per-row Python and no
range-explosion. Right rows sort before left rows at equal timestamps
(side 0 < 1), so the match is inclusive (right.ts <= left.ts); equal-ts
right rows are ordered by their payload ordering column, making "latest"
deterministic. At 100 TB both sides shuffle once on the key; skewed keys
are AQE's problem like any other join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, ts_col: str = "ts",
              by: str = "user_id",
              right_cols: tuple[str, ...] = ("event_id", "value"),
              prefix: str = "asof_") -> DataFrame:
    """left columns + ``{prefix}<c>`` for each right payload column, from
    the latest right row with right.ts <= left.ts in the same ``by``
    group; NULLs when no prior right row exists."""
    rpay = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    rtyp = right.select(rpay).schema["__r"].dataType
    ltyp = left.select(lpay).schema["__l"].dataType

    lpart = left.select(
        F.col(by).alias("__by"), F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"), lpay,
        F.lit(None).cast(rtyp).alias("__r"))
    rpart = right.select(
        F.col(by).alias("__by"), F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(ltyp).alias("__l"), rpay)
    u = lpart.unionByName(rpart)

    w = (Window.partitionBy("__by")
         .orderBy(F.col("__ts").asc(), F.col("__side").asc(),
                  F.col(f"__r.{right_cols[0]}").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.withColumn("__rf", F.last("__r", ignorenulls=True).over(w))
    return (filled.where(F.col("__side") == 1)
            .select(*[F.col(f"__l.{c}").alias(c) for c in left.columns],
                    *[F.col(f"__rf.{c}").alias(f"{prefix}{c}")
                      for c in right_cols]))


def range_join(points: DataFrame, intervals: DataFrame, ts_col: str = "ts",
               by: str = "user_id", start_col: str = "session_start",
               end_col: str = "session_end",
               bucket_seconds: int = 3600) -> DataFrame:
    """Interval (range) join: each point row joined to every interval of
    the same key with start <= ts < end.

    A naive non-equi join degenerates to BroadcastNestedLoopJoin in Spark
    — quadratic and non-scalable. The scale shape is the bucketing trick:
    quantize time into coarse buckets, explode each interval into the
    buckets it covers (bounded by interval length / bucket), equi-join on
    (key, bucket) — hash-partitioned, AQE-managed like any other join —
    and re-check the exact range on the survivors. A point's single
    bucket meets each covering interval exactly once, so no dedup step
    is needed. ``bucket_seconds`` trades explode factor (long intervals)
    against join selectivity (short ones); match it to the median
    interval length."""
    us = 1_000_000 * bucket_seconds
    # floor division, not truncating `div`: for pre-epoch (negative) micros
    # truncation rounds toward zero, putting a point and its covering
    # interval in different buckets. (x - pmod(x, us)) is exactly divisible,
    # so the subsequent div IS the floor — all-integer, no double rounding.
    def _fdiv(expr: str) -> str:
        return f"(({expr}) - pmod({expr}, {us})) div {us}"
    pb = points.withColumn("__b", F.expr(_fdiv(f"unix_micros({ts_col})")))
    ib = (intervals
          # end <= start can match nothing (start <= ts < end is empty) but
          # would make F.sequence explode a descending bucket list — drop
          .where(F.col(end_col) > F.col(start_col))
          .withColumn("__b", F.explode(F.sequence(
              F.expr(_fdiv(f"unix_micros({start_col})")),
              F.expr(_fdiv(f"unix_micros({end_col}) - 1"))))))
    return (pb.join(ib, [by, "__b"])
            .where((F.col(ts_col) >= F.col(start_col))
                   & (F.col(ts_col) < F.col(end_col)))
            .drop("__b"))


def join_cardinality_estimate(df_a, df_b, key_a: str,
                              key_b: str | None = None):
    """Pre-join audit: what would A JOIN B on this key produce — ONE row
    (n_left, n_right, n_keys_left, n_keys_right, n_keys_common,
    est_rows, max_key_fanout) with est_rows = sum over common keys of
    count_a * count_b (the EXACT inner-join output size, computed
    WITHOUT running the join) and max_key_fanout the worst single key's
    contribution. The sanity check that catches an accidental
    many-to-many blow-up before it happens at 100 TB — if est_rows is
    orders of magnitude above max(n_left, n_right), the key is wrong or
    needs pre-aggregation.

    Shape: one grouped count per side (map-side combined), one
    key-keyed join of the two BOUNDED count tables, a 1-row aggregate.
    Row payloads never move — only (key, count) pairs."""
    from pyspark.sql import functions as F
    kb = key_b or key_a
    ca = (df_a.where(F.col(key_a).isNotNull())
          .groupBy(F.col(key_a).alias("k"))
          .agg(F.count(F.lit(1)).alias("na")))
    cb = (df_b.where(F.col(kb).isNotNull())
          .groupBy(F.col(kb).alias("k"))
          .agg(F.count(F.lit(1)).alias("nb")))
    tot_a = df_a.where(F.col(key_a).isNotNull()).count()
    tot_b = df_b.where(F.col(kb).isNotNull()).count()
    j = ca.join(cb, "k")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_keys_common"),
        F.sum(F.col("na") * F.col("nb")).alias("est_rows"),
        F.max(F.col("na") * F.col("nb")).alias("max_key_fanout")
    ).collect()[0]
    ka = int(ca.count())
    kb_n = int(cb.count())
    return df_a.sparkSession.createDataFrame(
        [(tot_a, tot_b, ka, kb_n,
          int(agg["n_keys_common"] or 0), int(agg["est_rows"] or 0),
          int(agg["max_key_fanout"] or 0))],
        "n_left bigint, n_right bigint, n_keys_left bigint, "
        "n_keys_right bigint, n_keys_common bigint, est_rows bigint, "
        "max_key_fanout bigint")


# join_advisor thresholds — deterministic plan-choice rules over the
# cardinality audit. Spark's own autoBroadcastJoinThreshold is 10MB of
# SERIALIZED build side; 100k rows of typical dimension width sits near
# it, and using a row bound keeps the rule engine-checkable (byte size
# isn't SQL-derivable). Skew rule: one key carrying > SKEW_RATIO x the
# mean per-key output marks a salted join.
ADVISOR_BROADCAST_MAX_ROWS = 100_000
ADVISOR_SKEW_RATIO = 20.0


def join_advisor(df_a, df_b, key_a: str, key_b: str | None = None):
    """Join-strategy advisor: the cardinality audit plus a deterministic
    recommendation — ONE row (the join_cardinality_estimate columns +
    strategy, skew_key_share). Rules, applied in order:

    - ``broadcast(right)`` / ``broadcast(left)``: a side with <=
      ADVISOR_BROADCAST_MAX_ROWS rows ships to every executor and the
      join never shuffles the big side (what AQE would pick; stating it
      ahead of time lets a pipeline pin the hint and skip the runtime
      re-plan).
    - ``salted_shuffle``: both sides big AND the worst key contributes >
      ADVISOR_SKEW_RATIO x the mean per-common-key output — the straggler
      regime; salt the hot keys (AQE skew-join split handles moderate
      cases, explicit salting survives the extreme ones).
    - ``sort_merge_shuffle`` otherwise: both sides exchange on the key.

    skew_key_share = max_key_fanout / est_rows (sig6-rendered) — how much
    of the join's output the single worst key produces; 1/n_keys is the
    balanced baseline.

    Same cost shape as join_cardinality_estimate: only (key, count)
    pairs move."""
    from pyspark.sql import functions as F
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    base = join_cardinality_estimate(df_a, df_b, key_a, key_b).collect()[0]
    est, fan = base["est_rows"], base["max_key_fanout"]
    nk = base["n_keys_common"]
    mean_fan = (est / nk) if nk else 0.0
    if base["n_right"] <= ADVISOR_BROADCAST_MAX_ROWS:
        strat = "broadcast(right)"
    elif base["n_left"] <= ADVISOR_BROADCAST_MAX_ROWS:
        strat = "broadcast(left)"
    elif mean_fan > 0 and fan > ADVISOR_SKEW_RATIO * mean_fan:
        strat = "salted_shuffle"
    else:
        strat = "sort_merge_shuffle"
    share = (fan / est) if est else None
    return df_a.sparkSession.createDataFrame(
        [(*base, strat, sig6_py(share))],
        "n_left bigint, n_right bigint, n_keys_left bigint, "
        "n_keys_right bigint, n_keys_common bigint, est_rows bigint, "
        "max_key_fanout bigint, strategy string, skew_key_share string")


def fuzzy_key_join(df_a, df_b, key_a: str, key_b: str | None = None,
                   max_dist: int = 1, max_key_len: int = 48):
    """Record linkage: join two tables on APPROXIMATELY-equal string keys
    (Levenshtein distance <= ``max_dist``, case-normalized) — the
    entity-resolution primitive for joining scraped/hand-entered keys
    that exact equi-joins miss (misspelled vendor names, OCR'd ids).
    Output: (key_left, key_right, dist) distinct key-level matches;
    semi-join either table against it to materialize the linked rows.

    Never an all-pairs compare: SymSpell symmetric-delete blocking (the
    same public algorithm as text.typo_pairs) — if lev(a, b) <= d the
    two keys share a variant obtained by deleting <= d characters, so
    the candidate generation is an EQUI-join on exploded
    delete-neighborhood keys (distinct keys x O(len^d) variants), and
    one exact JVM ``levenshtein()`` recheck per candidate keeps true
    matches. Both sides collapse to DISTINCT keys first (map-side
    combined), so cost tracks key cardinality, not row counts.

    Key-length CONTRACT (mirrored verbatim by fuzzy_key_join_sql, so
    spec and blocking agree): keys longer than ``max_key_len`` generate
    no delete-neighborhood (it would be quadratic in length), so a pair
    at dist >= 1 is reported only when BOTH keys are <= max_key_len;
    dist = 0 matches are always found via the identity variant. The cut
    is deliberate — at 100 TB an unbounded neighborhood on one
    pathological key is a task OOM, and near-matches between
    beyond-cap keys are out of the operator's declared scope."""
    from pyspark.sql import functions as F
    if max_dist not in (0, 1, 2):
        raise ValueError("max_dist must be 0, 1 or 2")
    kb = key_b or key_a

    def keyed(df, key, side):
        ks = (df.where(F.col(key).isNotNull())
              .select(F.lower(F.col(key).cast("string")).alias("k"))
              .distinct())
        d1 = ("transform(sequence(1, length(k)), i -> "
              "concat(substring(k, 1, i-1), "
              f"substring(k, i+1, {max_key_len})))")
        if max_dist == 0:
            keys = "array(k)"
        elif max_dist == 1:
            keys = f"array_distinct(concat(array(k), {d1}))"
        else:
            d2 = (f"flatten(transform({d1}, s -> "
                  "transform(sequence(1, length(s)), j -> "
                  "concat(substring(s, 1, j-1), "
                  f"substring(s, j+1, {max_key_len})))))")
            keys = f"array_distinct(concat(array(k), {d1}, {d2}))"
        var = F.when(F.length("k") <= max_key_len,
                     F.expr(keys)).otherwise(F.array(F.col("k")))
        return ks.select(F.col("k").alias(f"key_{side}"),
                         F.explode(var).alias("__v"))

    cand = (keyed(df_a, key_a, "left")
            .join(keyed(df_b, kb, "right"), "__v")
            .select("key_left", "key_right").distinct())
    dist = F.levenshtein("key_left", "key_right")
    return (cand.withColumn("dist", dist)
            .where(F.col("dist") <= max_dist))
