"""Event-sequence analytics: ordered funnels and retention cohorts.

The behavioral-analytics companions to sessionize (streaming/
pipeline_stream.py): a funnel measures ORDERED step completion per user
(a purchase only counts if it follows a click that followed a view);
retention buckets users by first-activity week and measures how many come
back k weeks later. Both are classic warehouse queries a profiler-adjacent
engine is expected to answer, and both reduce to per-key aggregates +
key-equi-joins — no windows over raw event streams, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(df: DataFrame, steps: tuple[str, ...] = ("view", "click",
                                                    "purchase"),
           key_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts",
           within_minutes: int | None = None) -> DataFrame:
    """Strictly-ordered funnel: (step_idx, step, n_users, pct_of_first,
    pct_of_prev). A user completes step i at the EARLIEST event of that
    type occurring strictly after their step i-1 completion time —
    and, when ``within_minutes`` is set, no later than that many minutes
    after their FIRST-step completion (the conversion-window semantics
    of product analytics: a purchase a week after the view doesn't
    count).

    Shape: step 1 is one grouped min per user; each later step is one
    key-equi-join (user) against the previous step's completion times
    followed by a grouped min — steps-1 shuffles, all keyed by the user
    id, each carrying one or two timestamps per user, never raw event
    payloads. Conversion fractions are exact integer ratios rendered via
    sig6."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    from pyspark import StorageLevel
    ev = df.select(F.col(key_col).alias("k"),
                   F.col(type_col).alias("t"), F.col(ts_col).alias("ts"))
    completed = (ev.where(F.col("t") == steps[0])
                 .groupBy("k").agg(F.min("ts").alias("ct")))
    # the conversion deadline is anchored at the FIRST step's completion
    # and carried through the chain (functionally determined by the key,
    # so min() in each regroup is exact pass-through)
    if within_minutes is not None:
        completed = completed.withColumn(
            "deadline",
            F.col("ct") + F.expr(f"INTERVAL {int(within_minutes)} MINUTES"))
    # persist each step's (user, completion_ts) frame: the next step joins
    # it AND we count it, and without the persist step i would recompute
    # the whole i-deep join chain (counts are scalar metadata — the only
    # driver-side values in the operator)
    held = []
    completed = completed.persist(StorageLevel.MEMORY_AND_DISK)
    held.append(completed)
    counts = [completed.count()]
    for step in steps[1:]:
        prev_cols = ["k", F.col("ct").alias("prev")]
        if within_minutes is not None:
            prev_cols.append("deadline")
        nxt = (ev.where(F.col("t") == step)
               .join(completed.select(*prev_cols), "k")
               .where(F.col("ts") > F.col("prev")))
        if within_minutes is not None:
            nxt = nxt.where(F.col("ts") <= F.col("deadline"))
            completed = (nxt.groupBy("k")
                         .agg(F.min("ts").alias("ct"),
                              F.min("deadline").alias("deadline"))
                         .persist(StorageLevel.MEMORY_AND_DISK))
        else:
            completed = (nxt.groupBy("k").agg(F.min("ts").alias("ct"))
                         .persist(StorageLevel.MEMORY_AND_DISK))
        held.append(completed)
        counts.append(completed.count())
    for h in held:
        h.unpersist()
    spark = df.sparkSession
    rows = [(i + 1, s, counts[i]) for i, s in enumerate(steps)]
    out = spark.createDataFrame(
        rows, "step_idx int, step string, n_users bigint")
    first = F.lit(counts[0]).cast("double")
    prev = F.element_at(
        F.array(*[F.lit(c) for c in [counts[0]] + counts[:-1]]),
        F.col("step_idx")).cast("double")
    return out.select(
        "step_idx", "step", "n_users",
        sig6(F.when(first > 0, F.col("n_users") / first))
        .alias("pct_of_first"),
        sig6(F.when(prev > 0, F.col("n_users") / prev))
        .alias("pct_of_prev"))


def retention_cohorts(df: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts",
                      max_offset: int | None = None) -> DataFrame:
    """Weekly retention: (cohort_week, week_offset, n_active,
    retention_frac) — of the users whose FIRST event falls in
    cohort_week, how many were active week_offset weeks later.

    Shape: first-activity week per user (one grouped min), the distinct
    (user, week) activity matrix (one grouped distinct), one user-keyed
    join, then a bounded (cohort, offset) aggregate. Week arithmetic uses
    date_trunc('week') and exact integer day division, identical on both
    engines."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    # weeks carried as timestamps (not DATE): the driver's pandas compare
    # maps Spark DATE and DuckDB DATE to different dtypes, while both
    # engines' date_trunc timestamps land as datetime64
    ev = df.select(F.col(key_col).alias("k"),
                   F.date_trunc("week", F.col(ts_col)).alias("w"))
    first = ev.groupBy("k").agg(F.min("w").alias("cohort_week"))
    active = ev.distinct()
    j = (active.join(first, "k")
         .withColumn("week_offset",
                     (F.datediff(F.col("w"), F.col("cohort_week")) / 7)
                     .cast("int")))
    if max_offset is not None:
        j = j.where(F.col("week_offset") <= max_offset)
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    ret = (j.groupBy("cohort_week", "week_offset")
           .agg(F.count_distinct("k").alias("n_active"))
           .join(sizes, "cohort_week"))
    return ret.select(
        "cohort_week", "week_offset", "n_active",
        sig6(F.col("n_active").cast("double")
             / F.col("cohort_size").cast("double"))
        .alias("retention_frac"))


def resample(df: DataFrame, every_minutes: int = 60,
             ts_col: str = "ts", value_col: str = "value",
             fill: str = "locf") -> DataFrame:
    """Fixed-interval downsampling with gap fill: (bucket_ts, n, avg_val,
    filled) — one row per ``every_minutes`` bucket from the first to the
    last observed bucket, empty buckets carried forward (LOCF) or left
    NULL (``fill="null"``). The time_bucket_gapfill/LOCF primitive of
    time-series stores, as a DataFrame composition.

    Shape: one grouped aggregate keyed by bucket (bounded keys = span /
    interval); the complete bucket grid is GENERATED from the 1-row
    min/max aggregate (sequence explode — grid size is bounded metadata,
    not data); the carry-forward is one last(ignorenulls) window ordered
    by bucket over grid-sized input. Nothing re-touches raw rows after
    the first aggregate."""
    from pyspark.sql import Window
    from flink_descriptive_stats_spark.functions.sig import sig6
    step = every_minutes * 60
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col))
                      / F.lit(step)) * step).cast("bigint")
    agg = (df.where(F.col(ts_col).isNotNull())
           .groupBy(bucket.alias("b"))
           .agg(F.count(F.col(value_col)).alias("n"),
                F.avg(F.col(value_col)).alias("v")))
    mm = agg.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    grid = mm.select(F.explode(F.sequence(
        F.col("lo"), F.col("hi"), F.lit(step))).alias("b"))
    j = grid.join(agg, "b", "left")
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    filled = F.last("v", ignorenulls=True).over(w) if fill == "locf" \
        else F.col("v")
    return j.select(
        F.timestamp_seconds(F.col("b")).alias("bucket_ts"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        sig6(filled).alias("avg_val"),
        F.col("n").isNull().alias("filled"))



def autocorrelation(df: DataFrame, key_col: str = "event_type",
                    ts_col: str = "ts", id_col: str = "event_id",
                    value_col: str = "value",
                    max_lag: int = 5) -> DataFrame:
    """Per-series autocorrelation function: (series, lag, n_pairs, acf)
    for lag = 1..max_lag, the standard biased estimator
    r_k = sum((x_t - mean)(x_{t-k} - mean)) / sum((x_t - mean)^2)
    over each series ordered by (ts, id) — id breaks timestamp ties so
    the ordering (and therefore every lagged pair) is total and
    deterministic on any engine.

    Shape: one exchange keyed by the series for the lag window, the
    per-series mean joined back as a broadcast (series count is bounded),
    and one grouped aggregate on the SAME key — Catalyst reuses the
    window's hash partitioning for the final groupBy, so raw rows shuffle
    once. All max_lag numerators ride in that single aggregate."""
    from pyspark.sql import Window
    from flink_descriptive_stats_spark.functions.sig import sig6

    x = F.col(value_col).cast("double")
    base = df.select(F.col(key_col).alias("series"),
                     F.col(ts_col).alias("__ts"),
                     F.col(id_col).alias("__id"), x.alias("x"))
    mu = base.groupBy("series").agg(F.avg("x").alias("mu"))
    w = Window.partitionBy("series").orderBy("__ts", "__id")
    lagged = base.select(
        "series", "x",
        *[F.lag("x", k).over(w).alias(f"x{k}")
          for k in range(1, max_lag + 1)])
    cen = lagged.join(F.broadcast(mu), "series")
    aggs = [F.sum((F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu")))
            .alias("den")]
    for k in range(1, max_lag + 1):
        prod = (F.col("x") - F.col("mu")) * (F.col(f"x{k}") - F.col("mu"))
        aggs += [F.sum(prod).alias(f"num{k}"),
                 F.count(F.col(f"x{k}")).alias(f"n{k}")]
    g = cen.groupBy("series").agg(*aggs)
    branches = [g.select("series", F.lit(k).alias("lag"),
                         F.col(f"n{k}").alias("n_pairs"),
                         sig6(F.col(f"num{k}") / F.col("den")).alias("acf"))
                for k in range(1, max_lag + 1)]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


def transition_matrix(df: DataFrame, key_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition counts over per-user event sequences:
    (cur_type, next_type, n, prob) with prob = P(next | cur) among
    observed transitions. The sequence order is (ts, id) per user — total
    and deterministic.

    Shape: one exchange keyed by user for the lead() window, then a
    grouped count on (cur, next) — type-pair keys are bounded — and the
    row-normalization is a window sum over that bounded aggregate, never
    over raw events."""
    from pyspark.sql import Window
    from flink_descriptive_stats_spark.functions.sig import sig6

    w = Window.partitionBy("__k").orderBy("__ts", "__id")
    pairs = (df.select(F.col(key_col).alias("__k"),
                       F.col(ts_col).alias("__ts"),
                       F.col(id_col).alias("__id"),
                       F.col(type_col).alias("cur_type"))
             .withColumn("next_type", F.lead("cur_type").over(w))
             .where(F.col("next_type").isNotNull()))
    counts = pairs.groupBy("cur_type", "next_type").agg(
        F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("cur_type")
    return counts.select(
        "cur_type", "next_type", "n",
        sig6(F.col("n").cast("double") / F.sum("n").over(tot))
        .alias("prob"))


def rollup_profile(df: DataFrame, key_col: str = "event_type",
                   ts_col: str = "ts",
                   value_col: str = "value") -> DataFrame:
    """Multi-granularity profile via ROLLUP(key, day): per (key, day)
    cell, per key, and grand total in ONE pass — (key, day, gid, n,
    avg_val, min_val, max_val). ``gid`` is the grouping id
    (0 = finest cell, 1 = per-key subtotal, 3 = grand total), which
    disambiguates a genuinely-NULL key from a rolled-up one.

    Shape: Spark plans rollup as Expand (3 replicas tagged by grouping
    id) + one grouped aggregate — partial aggregation still applies, so
    the exchange carries one partial row per (replica key), never raw
    rows; the output is bounded by 3 x |keys x days|."""
    from flink_descriptive_stats_spark.functions.sig import sig6

    # day is rendered as a nullable 'yyyy-MM-dd' STRING: rolled-up rows
    # carry NULL, and NULL strings compare identically on every engine
    # while NULL timestamps (NaT) are comparator quicksand
    day = F.date_trunc("DAY", F.col(ts_col)).alias("d")
    x = F.col(value_col).cast("double")
    rolled = (df.select(F.col(key_col).alias("key"), day, x.alias("x"))
              .rollup("key", "d")
              .agg(F.grouping_id().alias("gid"),
                   F.count(F.lit(1)).alias("n"),
                   sig6(F.avg("x")).alias("avg_val"),
                   F.min("x").alias("min_val"),
                   F.max("x").alias("max_val")))
    return rolled.select(
        "key", F.date_format("d", "yyyy-MM-dd").alias("day"),
        "gid", "n", "avg_val", "min_val", "max_val")


def trend(df: DataFrame, key_col: str = "event_type", ts_col: str = "ts",
          value_col: str = "value") -> DataFrame:
    """Per-series least-squares linear trend: (series, n, slope_per_hour,
    intercept, r2). slope = cov(t, x) / var(t) with t in HOURS since the
    global minimum timestamp (hours keep the sufficient statistics within
    double range at month spans; anchoring at the global min makes the
    intercept comparable across series).

    ONE aggregation pass per series over the 5 sufficient sums (n, St,
    Sx, Stx, Stt — plus Sxx for R²); no window, no sort — the closed-form
    normal equations, so the only exchange is the bounded per-series
    aggregate. Degenerate series (single point, zero time variance)
    return NULL slope/intercept/r2 rather than engine-dependent NaN
    artifacts; R² of a constant-x series is NULL (0/0)."""
    from flink_descriptive_stats_spark.functions.sig import sig6

    t0 = df.agg(F.min(ts_col)).collect()[0][0]
    t = (F.unix_timestamp(F.col(ts_col))
         - F.lit(int(t0.timestamp()))).cast("double") / 3600.0
    x = F.col(value_col).cast("double")
    g = (df.where(F.col(ts_col).isNotNull() & x.isNotNull())
         .select(F.col(key_col).alias("series"), t.alias("t"), x.alias("x"))
         .groupBy("series")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("t").alias("st"),
              F.sum("x").alias("sx"),
              F.sum(F.col("t") * F.col("x")).alias("stx"),
              F.sum(F.col("t") * F.col("t")).alias("stt"),
              F.sum(F.col("x") * F.col("x")).alias("sxx")))
    n = F.col("n").cast("double")
    cov = F.col("stx") - F.col("st") * F.col("sx") / n
    vart = F.col("stt") - F.col("st") * F.col("st") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    slope = F.when(vart > 0, cov / vart)
    intercept = F.when(vart > 0,
                       (F.col("sx") - slope * F.col("st")) / n)
    r2 = F.when((vart > 0) & (varx > 0), cov * cov / (vart * varx))
    return g.select("series", "n", sig6(slope).alias("slope_per_hour"),
                    sig6(intercept).alias("intercept"),
                    sig6(r2).alias("r2"))


def event_paths(df: DataFrame, depth: int = 3, key_col: str = "user_id",
                type_col: str = "event_type", ts_col: str = "ts",
                id_col: str = "event_id", k: int = 20) -> DataFrame:
    """Top-k frequent event paths (behavioral path analysis): the most
    common ``depth``-step ordered event-type sequences across users —
    (path, n, rank), path rendered 'a>b>c'. Generalizes the order-1
    transition matrix to order depth-1.

    Shape: one exchange keyed by user for the lead windows (all depth-1
    leads share one window spec), a bounded (type^depth) grouped count,
    and the rank window runs over that bounded aggregate with the
    WindowGroupLimit pushdown; deterministic ties (n desc, path asc)."""
    from pyspark.sql import Window

    w = Window.partitionBy("__k").orderBy("__ts", "__id")
    base = df.select(F.col(key_col).alias("__k"),
                     F.col(ts_col).alias("__ts"),
                     F.col(id_col).alias("__id"),
                     F.col(type_col).alias("t0"))
    for i in range(1, depth):
        base = base.withColumn(f"t{i}", F.lead("t0", i).over(w))
    steps = [F.col(f"t{i}") for i in range(depth)]
    full = base.where(F.col(f"t{depth - 1}").isNotNull())
    counts = (full.select(F.concat_ws(">", *steps).alias("path"))
              .groupBy("path").agg(F.count(F.lit(1)).alias("n")))
    rk = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (counts.withColumn("rank", F.row_number().over(rk))
            .where(F.col("rank") <= k))


def seasonality_profile(df: DataFrame, ts_col: str = "ts",
                        value_col: str = "value") -> DataFrame:
    """Calendar seasonality view: (dimension, bucket, n, avg_val) for
    dimension in {hour_of_day (0-23), day_of_week (1=Mon..7)} — the
    when-does-load/value-concentrate profile behind capacity and
    anomaly baselines.

    One scan: both dimensions ride a single grouped aggregate over the
    unioned (dimension, bucket) key — bounded (31 keys) — instead of two
    jobs. Extraction functions are pinned to ISO conventions identical
    across engines (dayofweek is locale-dependent; weekday()+1 is not)."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    x = F.col(value_col).cast("double")
    base = df.where(F.col(ts_col).isNotNull()).select(
        F.hour(ts_col).cast("bigint").alias("hour_of_day"),
        (F.weekday(ts_col) + 1).cast("bigint").alias("day_of_week"),
        x.alias("x"))
    melted = base.selectExpr(
        "stack(2, 'hour_of_day', hour_of_day, "
        "'day_of_week', day_of_week) AS (dimension, bucket)", "x")
    return (melted.groupBy("dimension", "bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 sig6(F.avg("x")).alias("avg_val")))


def cusum_changepoint(df: DataFrame, key_col: str = "event_type",
                      ts_col: str = "ts", value_col: str = "value",
                      bucket_minutes: int = 360) -> DataFrame:
    """CUSUM mean-shift screen per series: bucket the series, accumulate
    S_t = sum_{i<=t} (bucket_mean_i - series_mean), and report where
    |S_t| peaks — (series, n_buckets, peak_bucket_ts, peak_cusum,
    cusum_threshold, shifted) with the standard heuristic threshold
    5 * sd(bucket means) (Page's CUSUM as a one-shot batch screen; a
    peak |S| above it flags a sustained mean shift, and the peak's
    LOCATION is the changepoint estimate).

    Shape: one grouped aggregate to buckets (bounded keys = span /
    interval per series), the running sum + peak windows run over that
    bounded bucket frame, never raw events."""
    from pyspark.sql import Window
    from flink_descriptive_stats_spark.functions.sig import sig6
    step = bucket_minutes * 60
    b = (F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(step))
         * step).cast("bigint")
    x = F.col(value_col).cast("double")
    buckets = (df.where(F.col(ts_col).isNotNull() & x.isNotNull())
               .groupBy(F.col(key_col).alias("series"), b.alias("b"))
               .agg(F.avg(x).alias("m")))
    per = Window.partitionBy("series")
    wrun = per.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    # series mean/sd materialize BEFORE the running sum (window functions
    # cannot nest); s and the peak decision round-trip through sig6 so
    # the discrete comparisons cannot fork on summation-order ULPs
    stats = buckets.select(
        "series", "b", "m",
        F.avg("m").over(per).alias("mu"),
        F.stddev_pop("m").over(per).alias("sd"),
        F.count(F.lit(1)).over(per).alias("n_buckets"))
    scored = stats.withColumn(
        "s", sig6(F.sum(F.col("m") - F.col("mu")).over(wrun))
        .cast("double"))
    wpk = Window.partitionBy("series").orderBy(
        F.abs(F.col("s")).desc(), F.col("b").asc())
    peak = (scored.withColumn("__rk", F.row_number().over(wpk))
            .where(F.col("__rk") == 1))
    thr = (sig6(F.lit(5.0) * F.col("sd")).cast("double"))
    return peak.select(
        "series", "n_buckets",
        F.timestamp_seconds(F.col("b")).alias("peak_bucket_ts"),
        sig6(F.col("s")).alias("peak_cusum"),
        sig6(thr).alias("cusum_threshold"),
        (F.abs(F.col("s")) > thr).alias("shifted"))


def latest_by_key(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """Latest record per entity (the SCD/compaction primitive: collapse
    an append-only event log to each key's current state). Deterministic
    ties via the id column. One key-partitioned rank — Spark plans the
    rank<=1 filter as WindowGroupLimit, so each partition forwards at
    most one row per key before the single keyed exchange (same
    no-salting funnel as top-K)."""
    from pyspark.sql import Window
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).desc(),
                                            F.col(id_col).desc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1).drop("__rk"))


def pareto_share(df: DataFrame, key_col: str = "user_id",
                 value_col: str = "value",
                 checkpoints: tuple = (1, 5, 10, 20, 50)) -> DataFrame:
    """Concentration (Pareto/80-20) report: what share of total value do
    the top X% of keys hold, for X in ``checkpoints`` — the skew
    quantifier behind both business questions (whale users) and ENGINE
    questions (how bad is this join key?). Output: (top_pct, n_keys,
    value_share).

    Shape: one grouped sum per key (map-side combined), then rank +
    cumulative-sum windows over the AGGREGATED key totals — the exact
    path sorts key totals, the documented trade (at extreme key
    cardinality swap the rank for approx percentile thresholds). The
    checkpoint row count is fixed and tiny."""
    from pyspark.sql import Window
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    x = F.col(value_col).cast("double")
    totals = (df.where(x.isNotNull())
              .groupBy(F.col(key_col).alias("k"))
              .agg(F.sum(x).alias("v")))
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
    ranked = totals.select(
        "v", F.row_number().over(w).alias("r"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"))
    ranked = ranked.persist()
    try:
        agg = ranked.agg(F.count(F.lit(1)).alias("n_keys"),
                         F.sum("v").alias("total")).collect()[0]
        n_keys, total = int(agg["n_keys"]), float(agg["total"])
        ks = {pct: max(1, int(n_keys * pct / 100)) for pct in checkpoints}
        # ONE job fetches every checkpoint's cumulative sum
        cums = {int(r["r"]): float(r["cum"]) for r in
                ranked.where(F.col("r").isin(list(set(ks.values()))))
                .select("r", "cum").collect()}
    finally:
        ranked.unpersist()
    out = [(int(pct), ks[pct],
            sig6_py(cums[ks[pct]] / total) if total else None)
           for pct in checkpoints]
    return df.sparkSession.createDataFrame(
        out, "top_pct int, n_top_keys bigint, value_share string")


def type_affinity(df: DataFrame, key_col: str = "user_id",
                  type_col: str = "event_type") -> DataFrame:
    """Market-basket affinity between event types: for each unordered
    type pair, (type_a, type_b, n_both, support, lift) over per-user
    baskets — lift = P(a,b) / (P(a) P(b)) with probabilities over users;
    lift > 1 = the behaviors attract, < 1 = they repel. The level-1
    association-rule (Apriori) primitive, and the behavioral sibling of
    the token-level PMI collocations.

    Shape: one distinct (user, type) projection (grouped, map-side
    combined), a self-equi-join keyed by user whose fan-out is bounded
    by types-per-user squared, a bounded (a, b) count, and single-row
    totals inlined as literals. Raw events never shuffle twice."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    ut = (df.select(F.col(key_col).alias("k"),
                    F.col(type_col).alias("t")).distinct())
    n_users = int(ut.select("k").distinct().count())
    per_type = ut.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    pairs = (ut.alias("x").join(ut.alias("y"), "k")
             .where(F.col("x.t") < F.col("y.t"))
             .groupBy(F.col("x.t").alias("type_a"),
                      F.col("y.t").alias("type_b"))
             .agg(F.count(F.lit(1)).alias("n_both")))
    j = (pairs
         .join(per_type.select(F.col("t").alias("type_a"),
                               F.col("n_t").alias("n_a")), "type_a")
         .join(per_type.select(F.col("t").alias("type_b"),
                               F.col("n_t").alias("n_b")), "type_b"))
    nu = F.lit(float(n_users))
    support = F.col("n_both").cast("double") / nu
    lift = (F.col("n_both").cast("double") * nu
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")))
    return j.select("type_a", "type_b", "n_both",
                    sig6(support).alias("support"),
                    sig6(lift).alias("lift"))


def interarrival_profile(df: DataFrame, key_col: str = "user_id",
                         ts_col: str = "ts",
                         id_col: str = "event_id") -> DataFrame:
    """Inter-arrival time profile: ONE row (n_deltas, mean_s, p50_s,
    p90_s, max_s, burstiness) over the per-user gaps between consecutive
    events — the burstiness/cadence diagnostic behind session-gap tuning
    (is 30 minutes the right sessionize gap for THIS corpus?) and
    bot-vs-human triage. burstiness = (sd - mean)/(sd + mean) in [-1, 1]
    (Goh & Barabási 2008): -1 = periodic, 0 = Poisson, -> 1 = bursty.

    Shape: one exchange keyed by user for the lag window (deltas are
    whole seconds — exact integers on both engines), then a single
    1-row aggregate; exact percentiles over the deltas are the oracle
    path (percentile_approx is the scale swap, as everywhere)."""
    from pyspark.sql import Window
    from flink_descriptive_stats_spark.functions.sig import sig6
    w = Window.partitionBy("__k").orderBy("__ts", "__id")
    d = (df.select(F.col(key_col).alias("__k"),
                   F.col(ts_col).alias("__ts"),
                   F.col(id_col).alias("__id"))
         .withColumn("__prev", F.lag("__ts").over(w))
         .where(F.col("__prev").isNotNull())
         .select((F.unix_timestamp("__ts")
                  - F.unix_timestamp("__prev")).cast("double")
                 .alias("dt")))
    mean, sd = F.avg("dt"), F.stddev_pop("dt")
    return d.agg(
        F.count(F.lit(1)).alias("n_deltas"),
        sig6(mean).alias("mean_s"),
        sig6(F.percentile(F.col("dt"), F.lit(0.5))).alias("p50_s"),
        sig6(F.percentile(F.col("dt"), F.lit(0.9))).alias("p90_s"),
        F.max("dt").alias("max_s"),
        sig6((sd - mean) / (sd + mean)).alias("burstiness"))


def late_arrival_audit(df: DataFrame, seq_col: str = "event_id",
                       ts_col: str = "ts",
                       key_col: str | None = None) -> DataFrame:
    """Out-of-order-arrival audit: ONE row (n_pairs, n_late,
    late_rate, max_lateness_s, p99_lateness_s) over consecutive events
    in ARRIVAL order (``seq_col`` — the ingestion sequence), measuring
    how far event time runs backwards — exactly the number that sizes a
    streaming WATERMARK: `withWatermark(ts, max_lateness)` loses nothing
    on this feed, p99 bounds the loss of a tighter delay. The batch
    diagnostic that configures the streaming operators.

    lateness of event i = max(0, running-max(ts) before i - ts_i),
    computed with a running-max window in arrival order (per key if
    ``key_col`` is given — per-key watermarks are what session/dedup
    state actually sees); then one 1-row aggregate with an exact p99
    (percentile_approx is the scale swap, as everywhere)."""
    from pyspark.sql import Window
    from flink_descriptive_stats_spark.functions.sig import sig6
    w = (Window.partitionBy(key_col) if key_col else
         Window.partitionBy()).orderBy("__s") \
        .rowsBetween(Window.unboundedPreceding, -1)
    t = F.unix_timestamp(F.col(ts_col)).cast("double")
    d = (df.select(F.col(seq_col).alias("__s"), t.alias("__t"),
                   *( [F.col(key_col)] if key_col else [] ))
         .withColumn("__prevmax", F.max("__t").over(w))
         .where(F.col("__prevmax").isNotNull())
         .select(F.greatest(F.col("__prevmax") - F.col("__t"),
                            F.lit(0.0)).alias("late")))
    return d.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_if(F.col("late") > 0).alias("n_late"),
        sig6(F.avg((F.col("late") > 0).cast("double")))
        .alias("late_rate"),
        F.max("late").alias("max_lateness_s"),
        sig6(F.percentile(F.col("late"), F.lit(0.99)))
        .alias("p99_lateness_s"))
