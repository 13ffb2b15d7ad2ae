"""Streaming variants of the pipeline operators (dedup, top-K).

The reference is batch-only; these are the Structured-Streaming analogues a
continuously-ingesting training-data pipeline needs. Both reuse the batch
operators' expressions so streaming and batch results coincide on the same
data (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: card-monitor phrase-tokenization contract version, recorded in the
#: snapshot meta row: bumped when phrase_hit_exprs' tokenization rule
#: changes hit semantics (2 = the r12 ASCII-whitespace class; the
#: unversioned era used str.split's Unicode class).
_PHRASE_TOK_VERSION = 2


def _pa_write_dir(path: str, table) -> None:
    """Write a TINY driver-local pyarrow table as a parquet directory that
    spark.read.parquet accepts (part file + _SUCCESS), atomically (temp
    dir + rename). Spark's createDataFrame -> parquet committer costs
    1.5-2.5s per write regardless of size (measured) — for O(rules) or
    O(sketch-cells) state that overhead IS the epoch time, so monitor
    state/sinks bypass Spark on the write side."""
    import os
    import shutil
    import pyarrow.parquet as pq
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)


def streaming_exact_dedup(stream: DataFrame, content_col: str = "text",
                          ts_col: str | None = None,
                          delay: str = "1 hour",
                          canonical: bool = False) -> DataFrame:
    """Exact streaming dedup on the content hash (same md5 key as
    operators/dedup.exact_dedup). ``canonical=True`` keys on the
    canonical form instead (operators/dedup._canonical_expr: lowercase,
    collapse non-alnum runs) — the streaming twin of canonical_dedup,
    suppressing formatting variants too; the state key stays one 32-char
    md5 either way.

    With ``ts_col`` the state is bounded: dropDuplicatesWithinWatermark
    suppresses duplicates arriving within the watermark delay and evicts
    state afterwards — the only shape that survives an unbounded stream.
    Without a timestamp it falls back to dropDuplicates (state grows with
    distinct keys; fine for bounded backfills, documented not to scale)."""
    if canonical:
        from flink_descriptive_stats_spark.operators.dedup import \
            _canonical_expr
        key = F.md5(_canonical_expr(content_col))
    else:
        key = F.md5(F.col(content_col))
    d = stream.withColumn("__content_md5", key)
    if ts_col:
        d = d.withWatermark(ts_col, delay)
        out = d.dropDuplicatesWithinWatermark(["__content_md5"])
    else:
        out = d.dropDuplicates(["__content_md5"])
    return out.drop("__content_md5")


def windowed_token_counts(stream: DataFrame, ts_col: str = "ts",
                          token_col: str = "event_type",
                          window: str = "6 hours",
                          watermark: str | None = "1 hour") -> DataFrame:
    """Streaming-safe per-window token counts — the aggregation half of a
    windowed top-K. Ranking (row_number) is not allowed mid-stream, so
    ``rank_topk`` applies to the materialized result (foreachBatch or the
    memory/table sink); within-window counts are exact. Cross-window global
    top-K over an unbounded stream needs a sketch (count-min) — documented
    limitation, mirroring the batch operator's exact-within-scope contract.
    """
    if watermark:
        stream = stream.withWatermark(ts_col, watermark)
    return (stream
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     F.col(token_col).alias("token"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"), "token", "cnt"))


def sessionize(df: DataFrame, ts_col: str = "ts",
               key_col: str = "user_id", gap: str = "30 minutes",
               value_col: str = "value",
               watermark: str | None = None) -> DataFrame:
    """Session rollup per key: gap-based session_window groupBy emitting
    (key, session_start, session_end, duration_s, n_events, value min/max/
    mean). session_window is Structured-Streaming-native (mergeable session
    state + watermark eviction); the identical plan runs in batch, which is
    what the DuckDB gaps-and-islands oracle checks.

    Scale: one shuffle keyed by (key, merged session) — session merging is
    per-key local after the shuffle; hot keys are bounded by a single user's
    event volume."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    if watermark:  # required for streaming input (session state eviction)
        df = df.withWatermark(ts_col, watermark)
    x = F.col(value_col).cast("double")
    agg = (df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"),
                      F.col(key_col))
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.min(x).alias("min_val"), F.max(x).alias("max_val"),
                F.avg(x).alias("__mean")))
    dur = (F.unix_micros(F.col("win.end"))
           - F.unix_micros(F.col("win.start"))) / F.lit(1_000_000.0)
    return agg.select(
        F.col(key_col), F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        sig6(dur).alias("duration_s"), F.col("n_events"),
        "min_val", "max_val", sig6(F.col("__mean")).alias("mean_val"))


def session_summary(df: DataFrame, ts_col: str = "ts",
                    key_col: str = "user_id",
                    gap: str = "30 minutes") -> DataFrame:
    """Corpus-level engagement summary over gap-based sessions: ONE row
    (n_sessions, n_users, avg_events, max_events, avg_duration_s,
    bounce_rate) where bounce_rate is the share of single-event sessions
    — the rollup a product-analytics dashboard reads off sessionize's
    per-session table.

    Same session_window grouping as sessionize (one keyed shuffle), then
    a 1-row aggregate over the bounded per-session frame; durations are
    aggregated RAW and only the final averages go through sig6."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    per = (df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"),
                      F.col(key_col).alias("k"))
           .agg(F.count(F.lit(1)).alias("n")))
    dur = (F.unix_micros(F.col("win.end"))
           - F.unix_micros(F.col("win.start"))) / F.lit(1_000_000.0)
    return (per.select("k", "n", dur.alias("dur"))
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.count_distinct("k").alias("n_users"),
                 sig6(F.avg("n")).alias("avg_events"),
                 F.max("n").alias("max_events"),
                 sig6(F.avg("dur")).alias("avg_duration_s"),
                 sig6(F.avg(F.when(F.col("n") == 1, 1.0).otherwise(0.0)))
                 .alias("bounce_rate")))


def rank_topk(counts: DataFrame, k: int = 5) -> DataFrame:
    """Rank materialized windowed counts into per-window top-K
    (deterministic ties: cnt desc, token asc)."""
    w = Window.partitionBy("window_start").orderBy(
        F.col("cnt").desc(), F.col("token").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def start_windowed_topk(stream: DataFrame, sink_path: str,
                        k: int = 5, ts_col: str = "ts",
                        token_col: str = "event_type",
                        window: str = "6 hours",
                        watermark: str | None = "1 hour"):
    """End-to-end streaming windowed top-K: windowed_token_counts ->
    foreachBatch(rank_topk -> overwrite ``sink_path``). Returns the started
    StreamingQuery (caller stops it).

    Ranking (row_number) is not allowed mid-stream, so it runs inside
    foreachBatch over each epoch's materialized counts — with complete
    output mode every epoch carries the full per-window counts, so the sink
    always holds the exact current top-K per window. The ranking input is
    windows x tokens (already aggregated), tiny relative to the stream, so
    the per-epoch sort is bounded regardless of input rate."""
    counts = windowed_token_counts(stream, ts_col, token_col, window,
                                   watermark)

    def emit(batch_df: DataFrame, _epoch_id: int) -> None:
        rank_topk(batch_df, k).write.mode("overwrite").parquet(sink_path)

    return (counts.writeStream.outputMode("complete")
            .foreachBatch(emit).start())


def start_global_topk_sketch(stream: DataFrame, sink_path: str,
                             text_col: str = "text", k: int = 20,
                             depth: int | None = None,
                             width: int | None = None,
                             max_candidates: int = 10_000,
                             state_path: str | None = None,
                             checkpoint_path: str | None = None,
                             _collect_probe=None):
    """Cross-window GLOBAL top-K over an unbounded stream via count-min
    merge — the sketch path windowed_token_counts documents as the only
    scalable answer to global ranking on a stream.

    Each micro-batch contributes its own count-min grid (computed
    distributed, operators/sketch.countmin_sketch); foreachBatch folds it
    into a driver-held accumulator. The grid is a commutative monoid of
    bounded size (<= depth x width cells, a few KB — this is sketch state,
    not data, so the per-epoch collect is legitimate), hence the merged
    grid after N batches is IDENTICAL to the batch grid over the
    concatenated data: streaming == batch exactly, asserted in tests.
    Candidate tokens are the union of per-batch distincts, pruned to the
    top ``max_candidates`` by current estimate (the standard heavy-hitters
    candidate cap; exact for vocabularies under the cap). The pruning runs
    IN SPARK: each epoch unions the carried (bounded) candidate set with
    the epoch's distinct tokens, ranks the union by count-min estimate
    with the same expressions as the batch operator, and collects only the
    top ``max_candidates`` rows — the driver never holds an epoch's full
    vocabulary, so candidate state is O(max_candidates) regardless of
    stream vocabulary size. The sink gets the current (token, est, rank)
    top-K from the same ranked result, overwritten every epoch.

    Retried epochs are handled: batch ids are monotone within a run, so
    folding only epochs above a ``last_folded`` watermark makes a
    foreachBatch replay (sink write failed after the fold) a no-op.
    Without ``state_path`` the accumulator lives only in this process —
    after a driver restart the merged grid restarts empty while a
    checkpointed source skips already-read files. Pass ``state_path`` AND
    ``checkpoint_path`` together (enforced: either alone silently loses
    data on restart) to make the query restart-durable: the merged grid +
    candidate tokens + watermark snapshot to parquet after every fold and
    reload on the next start; the checkpoint keeps epoch numbering
    monotone across restarts, which the watermark guard relies on. The
    snapshot records the sketch geometry and refuses to reload under a
    different depth/width (merging grids of different shapes would
    silently corrupt every estimate)."""
    import json as _json
    import os
    from flink_descriptive_stats_spark.operators import sketch as sk
    if (state_path is None) != (checkpoint_path is None):
        raise ValueError(
            "state_path and checkpoint_path must be passed together: a "
            "checkpointed source with no persisted grid loses pre-restart "
            "counts; a persisted grid with no checkpoint replays epoch ids "
            "the watermark guard would skip")
    depth = sk.CM_DEPTH if depth is None else depth
    width = sk.CM_WIDTH if width is None else width
    grid: dict[tuple[int, int], int] = {}
    tokens: set[str] = set()
    last_folded = -1

    def _versions() -> list[int]:
        if not (state_path and os.path.isdir(state_path)):
            return []
        return sorted(
            int(n[1:]) for n in os.listdir(state_path)
            if n.startswith("v") and n[1:].isdigit()
            and os.path.exists(os.path.join(state_path, n, "_SUCCESS")))

    latest = _versions()
    if latest:
        # snapshots are versioned dirs (v<epoch>); a crash mid-write leaves
        # a _SUCCESS-less dir that is simply ignored, never a lost state
        first = stream.sparkSession.read.parquet(
            os.path.join(state_path, f"v{latest[-1]}"))
        for r in first.collect():
            if r["kind"] == "cell":
                grid[(r["d"], r["b"])] = r["c"]
            elif r["kind"] == "token":
                tokens.add(r["token"])
            else:
                meta = _json.loads(r["token"])
                if (meta["depth"], meta["width"]) != (depth, width):
                    raise ValueError(
                        f"snapshot at {state_path} was built with "
                        f"depth={meta['depth']} width={meta['width']}; "
                        f"refusing to merge into a {depth}x{width} grid")
                last_folded = meta["last_folded"]

    def _snapshot(spark, epoch_id: int) -> None:
        import shutil
        import pyarrow as pa
        meta = _json.dumps({"depth": depth, "width": width,
                            "last_folded": epoch_id})
        rows = ([("cell", d, b, c, None) for (d, b), c in grid.items()]
                + [("token", None, None, None, t) for t in sorted(tokens)]
                + [("meta", None, None, None, meta)])
        # grid + candidate state is <= depth*width + max_candidates rows of
        # driver-local scalars — pyarrow-write it (see _pa_write_dir)
        _pa_write_dir(
            os.path.join(state_path, f"v{epoch_id}"),
            pa.table({
                "kind": [r[0] for r in rows],
                "d": pa.array([r[1] for r in rows], pa.int32()),
                "b": pa.array([r[2] for r in rows], pa.int32()),
                "c": pa.array([r[3] for r in rows], pa.int64()),
                "token": [r[4] for r in rows]}))
        for v in _versions()[:-1]:      # keep only the newest snapshot
            shutil.rmtree(os.path.join(state_path, f"v{v}"),
                          ignore_errors=True)

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal last_folded
        spark = batch_df.sparkSession

        def _grid_df() -> DataFrame:
            return spark.createDataFrame(
                [(d, b, c) for (d, b), c in grid.items()],
                "d int, b int, c bigint")

        def _tok_df() -> DataFrame:
            return spark.createDataFrame([(t,) for t in sorted(tokens)],
                                         "token string")

        if epoch_id > last_folded:
            last_folded = epoch_id
            # one tokenize pass feeds both the grid and the candidate rank
            occ = sk._token_occurrences(batch_df, text_col).persist()
            try:
                for r in sk.countmin_grid_from_occurrences(
                        occ, depth, width).collect():
                    key = (r["d"], r["b"])
                    grid[key] = grid.get(key, 0) + r["c"]
                # candidate pruning IN Spark: carried bounded set UNION the
                # epoch's distinct tokens, ranked by current estimate; only
                # the top max_candidates rows ever reach the driver
                cand = _tok_df().unionAll(occ.distinct()).distinct()
                est = sk.estimate_tokens(_grid_df(), cand, depth, width)
                kept = sk.rank_estimates(est, max_candidates).collect()
                tokens.clear()
                tokens.update(r["token"] for r in kept)
            finally:
                occ.unpersist()
            if _collect_probe is not None:
                _collect_probe(len(kept))
            if state_path:
                _snapshot(spark, epoch_id)
            # sink from the already-ranked rows (rank <= k is a prefix of
            # the rank <= max_candidates ordering — no recomputation)
            import pyarrow as pa
            topk_rows = [(r["token"], r["est"], r["rank"])
                         for r in kept if r["rank"] <= k]
            _pa_write_dir(sink_path, pa.table({
                "token": [r[0] for r in topk_rows],
                "est": pa.array([r[1] for r in topk_rows], pa.int64()),
                "rank": pa.array([r[2] for r in topk_rows], pa.int32())}))
        else:
            # replayed epoch (sink write failed after the fold): re-rank
            # the bounded candidate set against the already-merged grid
            est = sk.estimate_tokens(_grid_df(), _tok_df(), depth, width)
            (sk.rank_estimates(est, k)
             .write.mode("overwrite").parquet(sink_path))

    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def start_constraint_monitor(stream: DataFrame, rules: list[tuple],
                             sink_path: str,
                             state_path: str | None = None,
                             checkpoint_path: str | None = None):
    """Continuous data-quality monitoring: evaluate a declarative
    constraint suite (operators/quality.py) over an unbounded stream and
    keep RUNNING totals — the sink always holds the cumulative
    (rule, column, n_rows, n_violations, passed) report over everything
    seen so far.

    Row-local rule counts (not_null / in_range / matches / in_set) are
    sums, i.e. a commutative monoid: each micro-batch contributes ONE
    distributed aggregate (same `_violation_expr` codegen as the batch
    operator) whose 1-row result folds into the driver-held totals, so
    after N batches the report is IDENTICAL to batch check_constraints
    over the concatenated data (asserted in tests). `unique` rules are
    REJECTED here: exact cross-batch distinctness is not a bounded
    monoid — at stream scale that family belongs to
    `dropDuplicatesWithinWatermark` (bounded-lateness dedup) or an HLL
    sketch, both already shipped, not to a silent wrong count.

    Durability follows start_global_topk_sketch: versioned one-row
    parquet snapshots (v<epoch>/_SUCCESS) + an epoch watermark make
    restarts lossless and foreachBatch replays no-ops; state is
    O(rules), a few hundred bytes, regardless of stream size."""
    import json as _json
    import os
    from flink_descriptive_stats_spark.operators.quality import (
        _violation_expr, rule_label)
    for r in rules:
        if r[0] == "unique":
            raise ValueError(
                "unique rules are not streamable (cross-batch distinctness "
                "is not a bounded monoid); use "
                "dropDuplicatesWithinWatermark or the HLL distinct path")
    if (state_path is None) != (checkpoint_path is None):
        raise ValueError(
            "state_path and checkpoint_path must be passed together (see "
            "start_global_topk_sketch)")
    labels = [(rule_label(r), r[1]) for r in rules]
    totals = {"__n": 0, **{f"__v{i}": 0 for i in range(len(rules))}}
    last_folded = -1

    def _versions() -> list[int]:
        if not (state_path and os.path.isdir(state_path)):
            return []
        return sorted(
            int(n[1:]) for n in os.listdir(state_path)
            if n.startswith("v") and n[1:].isdigit()
            and os.path.exists(os.path.join(state_path, n, "_SUCCESS")))

    latest = _versions()
    if latest:
        snap = stream.sparkSession.read.parquet(
            os.path.join(state_path, f"v{latest[-1]}")).collect()[0]
        meta = _json.loads(snap["meta"])
        if meta["labels"] != [list(p) for p in labels]:
            raise ValueError(
                f"snapshot at {state_path} was built for a different rule "
                f"suite {meta['labels']}; refusing to merge")
        last_folded = meta["last_folded"]
        for k in totals:
            totals[k] = int(snap[k])

    def _write_report() -> None:
        import pyarrow as pa
        rows = [(lbl, col, totals["__n"], totals[f"__v{i}"],
                 totals[f"__v{i}"] == 0)
                for i, (lbl, col) in enumerate(labels)]
        _pa_write_dir(sink_path, pa.table(
            {"rule": [r[0] for r in rows],
             "column": [r[1] for r in rows],
             "n_rows": pa.array([r[2] for r in rows], pa.int64()),
             "n_violations": pa.array([r[3] for r in rows], pa.int64()),
             "passed": [r[4] for r in rows]}))

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal last_folded
        if epoch_id > last_folded:
            aggs = [F.count(F.lit(1)).alias("__n")]
            aggs += [_violation_expr(r).alias(f"__v{i}")
                     for i, r in enumerate(rules)]
            row = batch_df.agg(*aggs).collect()[0]
            for k in totals:
                totals[k] += int(row[k])
            last_folded = epoch_id
            if state_path:
                import shutil
                import pyarrow as pa
                meta = _json.dumps({
                    "labels": [list(p) for p in labels],
                    "last_folded": epoch_id})
                cols = {k: pa.array([totals[k]], pa.int64())
                        for k in sorted(totals)}
                cols["meta"] = [meta]
                _pa_write_dir(os.path.join(state_path, f"v{epoch_id}"),
                              pa.table(cols))
                for v in _versions()[:-1]:
                    shutil.rmtree(os.path.join(state_path, f"v{v}"),
                                  ignore_errors=True)
        _write_report()

    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def start_drift_monitor(stream: DataFrame, ref_df: DataFrame, column: str,
                        sink_path: str, bins: int = 10,
                        state_path: str | None = None,
                        checkpoint_path: str | None = None):
    """Continuous distribution-drift monitoring: bucket edges come from a
    FIXED reference snapshot (same ±inf edge-bucket convention as
    extras.psi_drift); each micro-batch contributes one bounded grouped
    bucket count (bins + 2 keys) folded into running live counts — a sum
    monoid, so the report after N batches equals the batch js_drift /
    psi_drift of the reference against everything seen (tested). The
    sink always holds the current per-bucket
    (bucket, n_ref, n_live, pct_ref, pct_live, psi_term, jsd_term);
    total drift = the column sums.

    State is O(bins); snapshots/report writes go through the pyarrow
    fast path (_pa_write_dir), same durability contract as the other
    monitors (versioned v<epoch> dirs + epoch watermark)."""
    import json as _json
    import os
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    if (state_path is None) != (checkpoint_path is None):
        raise ValueError(
            "state_path and checkpoint_path must be passed together (see "
            "start_global_topk_sketch)")
    c = F.col(column)
    mm = ref_df.agg(F.min(c).alias("mn"), F.max(c).alias("mx")).collect()[0]
    mn, mx = mm["mn"], mm["mx"]
    if mn is None or mx == mn:
        raise ValueError(f"column {column!r}: reference has no numeric "
                         f"spread to bucket")
    width = (float(mx) - float(mn)) / float(bins)

    def bucket_expr():
        return (F.when(c < mn, F.lit(-1))
                .when(c > mx, F.lit(bins))
                .when(c >= mx, F.lit(bins - 1))
                .otherwise(F.floor((c - F.lit(mn)) / F.lit(width))
                           .cast("int")))

    def counts_of(df: DataFrame) -> dict[int, int]:
        rows = (df.where(c.isNotNull())
                .groupBy(bucket_expr().alias("b"))
                .agg(F.count(F.lit(1)).alias("n")).collect())
        return {int(r["b"]): int(r["n"]) for r in rows}

    ref = counts_of(ref_df)
    t_ref = sum(ref.values())
    live: dict[int, int] = {}
    last_folded = -1

    def _versions() -> list[int]:
        if not (state_path and os.path.isdir(state_path)):
            return []
        return sorted(
            int(n[1:]) for n in os.listdir(state_path)
            if n.startswith("v") and n[1:].isdigit()
            and os.path.exists(os.path.join(state_path, n, "_SUCCESS")))

    latest = _versions()
    if latest:
        snap = stream.sparkSession.read.parquet(
            os.path.join(state_path, f"v{latest[-1]}")).collect()
        meta = _json.loads(snap[0]["meta"])
        if (meta["column"], meta["bins"]) != (column, bins):
            raise ValueError(
                f"snapshot at {state_path} monitors "
                f"{meta['column']}/{meta['bins']} bins; refusing to merge")
        last_folded = meta["last_folded"]
        for r in snap:
            if r["b"] is not None:
                live[int(r["b"])] = int(r["n"])

    import math as _math

    def _report() -> None:
        import pyarrow as pa
        t_live = sum(live.values())
        rows = []
        eps = 1e-6
        for b in sorted(set(ref) | set(live)):
            pr = ref.get(b, 0) / t_ref if t_ref else 0.0
            pl = live.get(b, 0) / t_live if t_live else 0.0
            pre, ple = max(pr, eps), max(pl, eps)
            psi = (pre - ple) * _math.log(pre / ple)
            m = (pr + pl) / 2.0
            jsd = 0.0
            if pr > 0:
                jsd += pr * _math.log(pr / m) / 2.0
            if pl > 0:
                jsd += pl * _math.log(pl / m) / 2.0
            rows.append((b, ref.get(b, 0), live.get(b, 0), sig6_py(pr),
                         sig6_py(pl), sig6_py(psi), sig6_py(jsd)))
        _pa_write_dir(sink_path, pa.table({
            "bucket": pa.array([r[0] for r in rows], pa.int32()),
            "n_ref": pa.array([r[1] for r in rows], pa.int64()),
            "n_live": pa.array([r[2] for r in rows], pa.int64()),
            "pct_ref": [r[3] for r in rows],
            "pct_live": [r[4] for r in rows],
            "psi_term": [r[5] for r in rows],
            "jsd_term": [r[6] for r in rows]}))

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal last_folded
        if epoch_id > last_folded:
            for b, n in counts_of(batch_df).items():
                live[b] = live.get(b, 0) + n
            last_folded = epoch_id
            if state_path:
                import shutil
                import pyarrow as pa
                meta = _json.dumps({"column": column, "bins": bins,
                                    "last_folded": epoch_id})
                # an all-NULL epoch leaves live empty: write one
                # NULL-bucket row so the meta column still has a carrier
                bs = sorted(live) or [None]
                ns = [live[b] for b in bs] if bs != [None] else [None]
                _pa_write_dir(
                    os.path.join(state_path, f"v{epoch_id}"),
                    pa.table({
                        "b": pa.array(bs, pa.int32()),
                        "n": pa.array(ns, pa.int64()),
                        "meta": [meta] * len(bs)}))
                for v in _versions()[:-1]:
                    shutil.rmtree(os.path.join(state_path, f"v{v}"),
                                  ignore_errors=True)
        _report()

    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def _merge_state_rows(a: dict, b: dict) -> dict:
    """Driver-side Pébay merge of two per-column state dicts (n, mean,
    m2, m3, m4, min_val, max_val) — the same algebra as
    operators.moments.merge_profile_states, specialized for the monitor's
    O(columns) driver fold."""
    if a["n"] == 0:
        return dict(b)
    if b["n"] == 0:
        return dict(a)
    na, nb = a["n"], b["n"]
    n = float(na + nb)
    d = b["mean"] - a["mean"]
    m2 = a["m2"] + b["m2"] + d * d * na * nb / n
    m3 = (a["m3"] + b["m3"]
          + d ** 3 * na * nb * (na - nb) / n ** 2
          + 3.0 * d * (na * b["m2"] - nb * a["m2"]) / n)
    m4 = (a["m4"] + b["m4"]
          + d ** 4 * na * nb * (na * na - na * nb + nb * nb) / n ** 3
          + 6.0 * d * d * (na * na * b["m2"] + nb * nb * a["m2"]) / n ** 2
          + 4.0 * d * (na * b["m3"] - nb * a["m3"]) / n)
    return {"n": na + nb, "mean": a["mean"] + d * nb / n,
            "m2": m2, "m3": m3, "m4": m4,
            "min_val": min(a["min_val"], b["min_val"]),
            "max_val": max(a["max_val"], b["max_val"])}


def start_profile_monitor(stream: DataFrame, columns: list[str],
                          sink_path: str,
                          state_path: str | None = None,
                          checkpoint_path: str | None = None):
    """Continuous corpus-wide profile: each micro-batch contributes ONE
    distributed moment-bundle aggregate (operators.moments.profile_state
    — the explicit StatsPojo-monoid state), folded driver-side with the
    same Pébay merge, so the sink's (column, n, mean, var_pop, skewness,
    kurtosis, min_val, max_val) after N batches equals the batch
    incremental profile of everything seen (finalize rendering included
    — asserted in tests). State is O(columns); snapshots and the report
    go through the pyarrow fast path with the usual versioned-epoch
    durability contract."""
    import json as _json
    import math as _math
    import os
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators import moments as mo
    if (state_path is None) != (checkpoint_path is None):
        raise ValueError(
            "state_path and checkpoint_path must be passed together (see "
            "start_global_topk_sketch)")
    zero = {"n": 0, "mean": 0.0, "m2": 0.0, "m3": 0.0, "m4": 0.0,
            "min_val": _math.inf, "max_val": -_math.inf}
    state = {c: dict(zero) for c in columns}
    last_folded = -1

    def _versions() -> list[int]:
        if not (state_path and os.path.isdir(state_path)):
            return []
        return sorted(
            int(n[1:]) for n in os.listdir(state_path)
            if n.startswith("v") and n[1:].isdigit()
            and os.path.exists(os.path.join(state_path, n, "_SUCCESS")))

    latest = _versions()
    if latest:
        snap = stream.sparkSession.read.parquet(
            os.path.join(state_path, f"v{latest[-1]}")).collect()
        meta = _json.loads(snap[0]["meta"])
        if meta["columns"] != list(columns):
            raise ValueError(
                f"snapshot at {state_path} profiles {meta['columns']}; "
                f"refusing to merge")
        last_folded = meta["last_folded"]
        for r in snap:
            state[r["column"]] = {
                "n": int(r["n"]), "mean": float(r["mean"]),
                "m2": float(r["m2"]), "m3": float(r["m3"]),
                "m4": float(r["m4"]),
                "min_val": float(r["min_val"]),
                "max_val": float(r["max_val"])}

    def _report() -> None:
        import pyarrow as pa
        rows = []
        for c in columns:
            st = state[c]
            n = st["n"]
            if n == 0:
                rows.append((c, 0, None, None, None, None, None, None))
                continue
            m2 = st["m2"]
            var_pop = m2 / n
            if m2 > 0:
                skew = st["m3"] * _math.sqrt(n) / m2 ** 1.5
                kurt = n * st["m4"] / (m2 * m2) - 3.0
            else:
                skew = kurt = 0.0
            rows.append((c, n, sig6_py(st["mean"]), sig6_py(var_pop),
                         sig6_py(skew), sig6_py(kurt),
                         st["min_val"], st["max_val"]))
        _pa_write_dir(sink_path, pa.table({
            "column": [r[0] for r in rows],
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "mean": [r[2] for r in rows],
            "var_pop": [r[3] for r in rows],
            "skewness": [r[4] for r in rows],
            "kurtosis": [r[5] for r in rows],
            "min_val": pa.array([r[6] for r in rows], pa.float64()),
            "max_val": pa.array([r[7] for r in rows], pa.float64())}))

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal last_folded
        if epoch_id > last_folded:
            batch_rows = mo.profile_state(batch_df, columns).collect()
            for r in batch_rows:
                inc = {"n": int(r["n"]), "mean": float(r["mean"]),
                       "m2": float(r["m2"]), "m3": float(r["m3"]),
                       "m4": float(r["m4"]),
                       "min_val": (float(r["min_val"])
                                   if r["min_val"] is not None
                                   else _math.inf),
                       "max_val": (float(r["max_val"])
                                   if r["max_val"] is not None
                                   else -_math.inf)}
                state[r["column"]] = _merge_state_rows(state[r["column"]],
                                                       inc)
            last_folded = epoch_id
            if state_path:
                import shutil
                import pyarrow as pa
                meta = _json.dumps({"columns": list(columns),
                                    "last_folded": epoch_id})
                _pa_write_dir(
                    os.path.join(state_path, f"v{epoch_id}"),
                    pa.table({
                        "column": list(columns),
                        "n": pa.array([state[c]["n"] for c in columns],
                                      pa.int64()),
                        "mean": pa.array([state[c]["mean"]
                                          for c in columns], pa.float64()),
                        "m2": pa.array([state[c]["m2"] for c in columns],
                                       pa.float64()),
                        "m3": pa.array([state[c]["m3"] for c in columns],
                                       pa.float64()),
                        "m4": pa.array([state[c]["m4"] for c in columns],
                                       pa.float64()),
                        "min_val": pa.array([state[c]["min_val"]
                                             for c in columns],
                                            pa.float64()),
                        "max_val": pa.array([state[c]["max_val"]
                                             for c in columns],
                                            pa.float64()),
                        "meta": [meta] * len(columns)}))
                for v in _versions()[:-1]:
                    shutil.rmtree(os.path.join(state_path, f"v{v}"),
                                  ignore_errors=True)
        _report()

    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def start_card_monitor(stream: DataFrame, sink_path: str,
                       state_path: str | None = None,
                       checkpoint_path: str | None = None,
                       text_col: str = "text", id_col: str = "doc_id",
                       source_col: str = "source",
                       payload_col: str | None = None,
                       url_col: str | None = None,
                       url_suffixes: list[str] | None = None,
                       cleaning_section: bool = False,
                       boilerplate_phrases: list[str] | None = None):
    """Continuous dataset card: the running corpus datasheet over an
    unbounded document ingest — after N micro-batches the sink holds
    the same (section, metric, value) rows ``dataset_card`` reports on
    the union of everything seen (streaming == batch pytest-pinned),
    with ONE documented delta: the two duplicate fractions ride
    mergeable HLL sketches (``hll_sketch_agg`` per batch, driver-folded
    with ``hll_union``) instead of an exact cross-batch
    count_distinct, because exact distinctness over an unbounded
    stream is not a bounded monoid (the same boundary
    start_constraint_monitor declares for `unique` rules) — the rows
    are named ``*_dup_fraction_approx`` to say so. Everything else is
    exactly mergeable: counters (docs/tokens/chars/quality-sum/low-q/
    PII) are sums, source and language tallies are bounded keyed maps,
    and median_tokens stays EXACT via a token-count histogram state
    (token counts are small integers, so the histogram is
    vocabulary-of-counts-bounded — the stream gets an exact order
    statistic no sketch could give).

    Per micro-batch: the single-pass card's OWN per-doc projection
    (text_stats_exprs / pii_exprs / lang scores / both content hashes
    — one scan of the batch), then one global aggregate + one bounded
    (source, lang) groupBy + one bounded (n_tokens) groupBy. State is
    O(sources + langs + distinct token counts + 2 sketches); snapshots
    follow the versioned-epoch durability contract of the other
    monitors (restart-safe, replay-idempotent via last_folded).

    ``payload_col`` (r10): when named AND present in the stream, each
    batch additionally runs ONE media_fingerprints Arrow pass (the
    auto container sniff) and folds the per-kind (n_payloads,
    decodable) counters — pure sum-monoids — so the streaming
    datasheet reports the batch card's media summary and per-modality
    n_payloads / decodable_fraction rows exactly (streaming == batch
    pinned). ``neardup_cluster_fraction`` stays BATCH-ONLY, declared
    not faked: cluster mass over an unbounded stream is not a bounded
    monoid (pairs span batches), the same boundary the two
    ``*_dup_fraction_approx`` rows and the constraint monitor's
    ``unique`` rule declare — run media_dedup_corpus / the batch card
    over the accumulated corpus for it.

    ``url_col`` (r10): when named AND present in the stream, each
    batch folds url_components' narrow expressions — and unlike media,
    the ENTIRE url section streams exactly: counts (docs, invalid,
    valid, query) and the path-depth sum are sum-monoids, and the
    per-domain tally is a bounded keyed map (domains are bounded the
    same way sources are), so n_domains and max_domain_share are
    EXACT across batches, not approximations (streaming == batch
    pinned row-for-row).

    ``cleaning_section`` (r10): opt-in ``cleaning`` rows (the batch
    card's cleaning_section twin) — damaged-doc count and per-class
    damage-character totals are pure sum-monoids riding the SAME
    per-batch projection (three extra regexp_count columns, no extra
    scan), so the whole section streams exactly (streaming == batch
    pinned)."""
    import json as _json
    import os
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators.dedup import \
        _canonical_expr
    from flink_descriptive_stats_spark.operators.text import (
        _lang_scores, _predicted_lang_expr, pii_exprs, text_stats_exprs)
    if (state_path is None) != (checkpoint_path is None):
        raise ValueError(
            "state_path and checkpoint_path must be passed together (see "
            "start_global_topk_sketch)")
    state = {"n": 0, "ntok": 0, "nch": 0, "qsum": 0.0, "lowq": 0,
             "pii": 0}
    src_counts: dict = {}
    lang_counts: dict = {}
    tok_hist: dict = {}
    media_counts: dict = {}     # kind -> [n_payloads, n_decodable]
    url_state = {"n": 0, "bad": 0, "ok": 0, "q": 0, "depth": 0}
    domain_counts: dict = {}    # domain -> n_docs (bounded keyed map)
    clean_state = {"dmg": 0, "tc": 0, "tz": 0, "ts": 0}
    bp_state = {"any": 0}
    bp_counts = [0] * len(boilerplate_phrases or [])
    sketches: dict = {"h": None, "hc": None}
    last_folded = -1

    def _versions() -> list[int]:
        if not (state_path and os.path.isdir(state_path)):
            return []
        return sorted(
            int(n[1:]) for n in os.listdir(state_path)
            if n.startswith("v") and n[1:].isdigit()
            and os.path.exists(os.path.join(state_path, n, "_SUCCESS")))

    latest = _versions()
    if latest:
        snap = stream.sparkSession.read.parquet(
            os.path.join(state_path, f"v{latest[-1]}")).collect()
        # legacy inference (ADVICE r11 #4): flag-less (pre-r11) snapshots
        # DID persist per-class cleaning counters when the section was
        # on — the "clean" state rows are written only under
        # cleaning_section=True — so their presence, not the missing
        # meta key, says how the snapshot was folded. Without this, a
        # valid cleaning_section=True accumulation would be refused on
        # restart and forced to discard state.
        has_clean_rows = any(r["kind"] == "clean" for r in snap)
        for r in snap:
            kind, key = r["kind"], r["key"]
            if kind == "meta":
                m = _json.loads(key)
                # config guard (same contract as the constraint/profile/
                # histogram/refint/delta monitors): the cleaning rows'
                # denominators (n, nch) count EVERY doc folded, so a
                # snapshot folded without the cleaning projection cannot
                # be continued with it (damage never scanned for those
                # docs) — refuse instead of silently under-reporting.
                snap_cleaning = bool(
                    m["cleaning_section"] if "cleaning_section" in m
                    else has_clean_rows)
                if snap_cleaning != bool(cleaning_section):
                    raise ValueError(
                        "card-monitor snapshot at "
                        f"{state_path} was folded with cleaning_section="
                        f"{snap_cleaning}; "
                        "refusing to merge with cleaning_section="
                        f"{bool(cleaning_section)}")
                if m.get("boilerplate_phrases") != (
                        list(boilerplate_phrases or []) or None):
                    raise ValueError(
                        "card-monitor snapshot at "
                        f"{state_path} was folded with "
                        f"boilerplate_phrases="
                        f"{m.get('boilerplate_phrases')}; refusing to "
                        "merge with boilerplate_phrases="
                        f"{list(boilerplate_phrases or []) or None}")
                # phrase-TOKENIZATION version (r12): phrase_hit_exprs
                # switched from str.split() (Unicode whitespace) to
                # the engine's ASCII class — the same phrase STRING
                # can count different docs across that change, so a
                # pre-r12 snapshot is only continuable when every
                # phrase tokenizes identically under both rules
                # (which covers all plain-ASCII phrase lists)
                if boilerplate_phrases and \
                        m.get("phrase_tok") != _PHRASE_TOK_VERSION:
                    from flink_descriptive_stats_spark.operators.dedup \
                        import _phrase_tokens
                    drifted = [
                        ph for ph in boilerplate_phrases
                        if [t.lower() for t in ph.split()]
                        != _phrase_tokens(ph, "card-monitor")]
                    if drifted:
                        raise ValueError(
                            "card-monitor snapshot at "
                            f"{state_path} predates the r12 phrase-"
                            "tokenization contract and these phrases "
                            "tokenize differently under it: "
                            f"{drifted}; refusing to merge counters "
                            "with mixed hit semantics")
                # same contract for the suffix set: the per-domain
                # tally is KEYED by the suffix-aware domain, so a
                # different list silently mixes keyings
                want_sfx = (sorted({x.lower().strip(".")
                                    for x in url_suffixes})
                            if url_suffixes else None)
                if m.get("url_suffixes") != want_sfx:
                    raise ValueError(
                        "card-monitor snapshot at "
                        f"{state_path} was folded with url_suffixes="
                        f"{m.get('url_suffixes')}; refusing to merge "
                        f"with url_suffixes={want_sfx}")
                last_folded = m["last_folded"]
                state.update({k: m[k] for k in state})
            elif kind == "src":
                src_counts[key] = int(r["n"])
            elif kind == "lang":
                lang_counts[key] = int(r["n"])
            elif kind == "tok":
                tok_hist[int(key)] = int(r["n"])
            elif kind == "media":
                mk, field = key.rsplit(":", 1)
                c = media_counts.setdefault(mk, [0, 0])
                c[0 if field == "n" else 1] = int(r["n"])
            elif kind == "url":
                url_state[key] = int(r["n"])
            elif kind == "clean":
                clean_state[key] = int(r["n"])
            elif kind == "bp":
                if key == "any":
                    bp_state["any"] = int(r["n"])
                else:
                    bp_counts[int(key)] = int(r["n"])
            elif kind == "dom":
                domain_counts[key] = int(r["n"])
            elif kind == "sketch":
                sketches[key] = bytes(r["bin"])

    def _estimate(spark, sk: bytes | None) -> int:
        if sk is None:
            return 0
        return int(spark.range(1).select(
            F.hll_sketch_estimate(F.lit(sk)).alias("e"))
            .collect()[0]["e"])

    def _union(spark, a: bytes | None, b: bytes | None) -> bytes | None:
        if a is None:
            return b
        if b is None:
            return a
        return bytes(spark.range(1).select(
            F.hll_union(F.lit(a), F.lit(b)).alias("u"))
            .collect()[0]["u"])

    def _median_from_hist() -> float | None:
        total = sum(tok_hist.values())
        if not total:
            return None
        # F.percentile semantics at p=0.5: linear interpolation on the
        # sorted values; reproduce it exactly from the histogram
        pos = 0.5 * (total - 1)
        lo_i, hi_i = int(pos), min(int(pos) + 1, total - 1)
        frac = pos - int(pos)
        acc = 0
        lo_v = hi_v = None
        for v in sorted(tok_hist):
            nxt = acc + tok_hist[v]
            if lo_v is None and lo_i < nxt:
                lo_v = v
            if hi_v is None and hi_i < nxt:
                hi_v = v
                break
            acc = nxt
        return lo_v + (hi_v - lo_v) * frac

    def _report(spark) -> None:
        import pyarrow as pa
        n = state["n"]
        rows: list = []
        if n:
            smax = max(src_counts.values())
            lrows = sorted(lang_counts.items(),
                           key=lambda kv: (-kv[1], kv[0]))
            cd = min(_estimate(spark, sketches["h"]), n)
            cc = min(_estimate(spark, sketches["hc"]), n)
            rows = [
                ("corpus", "n_docs", str(n)),
                ("corpus", "n_sources", str(len(src_counts))),
                ("corpus", "n_tokens", str(state["ntok"])),
                ("corpus", "n_chars", str(state["nch"])),
                ("corpus", "max_source_share", sig6_py(smax / n)),
                ("dedup", "exact_dup_fraction_approx",
                 sig6_py(1.0 - cd / n)),
                ("dedup", "canonical_dup_fraction_approx",
                 sig6_py(1.0 - cc / n)),
                ("quality", "mean_quality", sig6_py(state["qsum"] / n)),
                ("quality", "low_quality_fraction",
                 sig6_py(state["lowq"] / n)),
                ("quality", "median_tokens",
                 sig6_py(_median_from_hist())),
                ("lang", "top_lang", lrows[0][0]),
                ("lang", "top_lang_share", sig6_py(lrows[0][1] / n)),
                ("lang", "n_langs", str(len(lrows))),
                ("pii", "pii_doc_fraction", sig6_py(state["pii"] / n)),
            ]
            # cleaning section (r10): all sums, streams exactly —
            # rendered like the batch card's _cleaning_card_rows
            if cleaning_section:
                tot = (clean_state["tc"] + clean_state["tz"]
                       + clean_state["ts"])
                rows += [
                    ("cleaning", "damaged_doc_fraction",
                     sig6_py(clean_state["dmg"] / n)),
                    ("cleaning", "damaged_char_fraction",
                     sig6_py(tot / state["nch"])
                     if state["nch"] else None),
                    ("cleaning", "control_chars",
                     str(clean_state["tc"])),
                    ("cleaning", "zero_width_chars",
                     str(clean_state["tz"])),
                    ("cleaning", "unicode_space_chars",
                     str(clean_state["ts"])),
                ]
            # boilerplate section (r11): per-frozen-phrase doc counts
            # and the any-phrase fraction — pure sums, streams exactly
            # (rendered like _boilerplate_card_rows)
            if boilerplate_phrases:
                rows += [("boilerplate", f"docs_with[{ph}]",
                          str(bp_counts[i]))
                         for i, ph in enumerate(boilerplate_phrases)]
                rows.append(("boilerplate", "affected_doc_fraction",
                             sig6_py(bp_state["any"] / n)))
        # url section (r10): fully exact across batches — sums plus
        # the bounded domain map (see the function docstring); emitted
        # even when no doc had text, like media
        if url_state["n"]:
            un, uok = url_state["n"], url_state["ok"]
            rows += [
                ("url", "n_url_docs", str(un)),
                ("url", "invalid_url_fraction",
                 sig6_py(url_state["bad"] / un)),
                ("url", "n_domains", str(len(domain_counts))),
                ("url", "max_domain_share",
                 sig6_py(max(domain_counts.values()) / uok)
                 if uok and domain_counts else None),
                ("url", "query_url_fraction",
                 sig6_py(url_state["q"] / uok) if uok else None),
                ("url", "mean_path_depth",
                 sig6_py(url_state["depth"] / uok) if uok else None),
            ]
        # media counters (r10): the sum-monoid subset of the batch
        # card's media section (cluster mass is batch-only, see the
        # function docstring) — emitted even when no doc had text
        if media_counts:
            tot = sum(c[0] for c in media_counts.values())
            rows += [
                ("media", "n_payloads", str(tot)),
                ("media", "unrecognized_fraction",
                 sig6_py(media_counts.get("unknown", [0, 0])[0] / tot)
                 if tot else None),
            ]
            for mk, section in (("image", "media_image"),
                                ("audio", "media_audio")):
                c = media_counts.get(mk)
                if c and c[0]:
                    rows += [
                        (section, "n_payloads", str(c[0])),
                        (section, "decodable_fraction",
                         sig6_py(c[1] / c[0])),
                    ]
        # all three columns explicitly typed (ADVICE r9 #2): an empty
        # first batch used to infer null-typed section/metric columns,
        # writing a sink parquet Spark reads as void columns
        _pa_write_dir(sink_path, pa.table({
            "section": pa.array([r[0] for r in rows], pa.string()),
            "metric": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.string())}))

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal last_folded
        spark = batch_df.sparkSession
        if epoch_id > last_folded:
            c = F.col(text_col)
            clean_cols, clean_aggs = [], []
            if cleaning_section:
                from flink_descriptive_stats_spark.operators.cleaning \
                    import cleaning_agg_exprs, cleaning_signal_exprs
                clean_cols = cleaning_signal_exprs(text_col)
                clean_aggs = cleaning_agg_exprs()
            bp_cols, bp_aggs = [], []
            if boilerplate_phrases:
                from flink_descriptive_stats_spark.operators.dedup \
                    import phrase_hit_exprs
                bp_cols = phrase_hit_exprs(boilerplate_phrases,
                                           text_col)
                any_bp = None
                for i in range(len(boilerplate_phrases)):
                    b = F.col(f"__bp{i}")
                    any_bp = b if any_bp is None else (any_bp | b)
                bp_aggs = [F.count_if(F.col(f"__bp{i}"))
                           .alias(f"__bpc{i}")
                           for i in range(len(boilerplate_phrases))]
                bp_aggs.append(F.count_if(any_bp).alias("__bpany"))
            per = (batch_df.where(c.isNotNull())
                   .select(F.md5(c).alias("__h"),
                           F.md5(_canonical_expr(text_col)).alias("__hc"),
                           F.col(source_col).alias("__src"),
                           _predicted_lang_expr(_lang_scores(c))
                           .alias("__lang"),
                           *text_stats_exprs(text_col),
                           *pii_exprs(text_col),
                           *clean_cols, *bp_cols)
                   .persist())
            try:
                q = F.col("quality_score").cast("double")
                r = per.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("n_tokens").alias("ntok"),
                    F.sum("n_chars").alias("nch"),
                    F.sum(q).alias("qsum"),
                    F.count_if(q < 0.5).alias("lowq"),
                    F.count_if(F.col("n_pii") > 0).alias("p"),
                    F.hll_sketch_agg("__h").alias("sh"),
                    F.hll_sketch_agg("__hc").alias("shc"),
                    *clean_aggs, *bp_aggs).collect()[0]
                if int(r["n"]):
                    sl = (per.groupBy("__src", "__lang")
                          .agg(F.count(F.lit(1)).alias("c")).collect())
                    th = (per.groupBy("n_tokens")
                          .agg(F.count(F.lit(1)).alias("c")).collect())
                else:
                    sl, th = [], []
            finally:
                per.unpersist()
            state["n"] += int(r["n"])
            if int(r["n"]):
                state["ntok"] += int(r["ntok"])
                state["nch"] += int(r["nch"])
                state["qsum"] += float(r["qsum"])
                state["lowq"] += int(r["lowq"])
                state["pii"] += int(r["p"])
                sketches["h"] = _union(spark, sketches["h"],
                                       bytes(r["sh"]))
                sketches["hc"] = _union(spark, sketches["hc"],
                                        bytes(r["shc"]))
                for x in sl:
                    src_counts[x["__src"]] = (
                        src_counts.get(x["__src"], 0) + x["c"])
                    lang_counts[x["__lang"]] = (
                        lang_counts.get(x["__lang"], 0) + x["c"])
                for x in th:
                    k = int(x["n_tokens"])
                    tok_hist[k] = tok_hist.get(k, 0) + x["c"]
                if boilerplate_phrases:
                    for i in range(len(boilerplate_phrases)):
                        bp_counts[i] += int(r[f"__bpc{i}"])
                    bp_state["any"] += int(r["__bpany"])
                if cleaning_section:
                    clean_state["dmg"] += int(r["cdmg"])
                    clean_state["tc"] += int(r["ctc"])
                    clean_state["tz"] += int(r["ctz"])
                    clean_state["ts"] += int(r["cts"])
            if payload_col is not None and payload_col in batch_df.columns:
                from flink_descriptive_stats_spark.operators.multimodal \
                    import media_fingerprints
                mf = (media_fingerprints(
                        batch_df.where(F.col(payload_col).isNotNull()),
                        payload_col=payload_col, id_col=id_col)
                      .groupBy("kind")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.count_if(F.col("decoded")).alias("d"))
                      .collect())
                for x in mf:
                    c = media_counts.setdefault(x["kind"], [0, 0])
                    c[0] += int(x["n"])
                    c[1] += int(x["d"])
            if url_col is not None and url_col in batch_df.columns:
                from flink_descriptive_stats_spark.operators.urls \
                    import url_components
                comp = url_components(batch_df, url_col=url_col,
                                      id_col=id_col,
                                      suffixes=url_suffixes).persist()
                try:
                    ur = comp.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.count_if(~F.col("valid")).alias("bad"),
                        F.count_if(F.col("valid")).alias("ok"),
                        F.count_if(F.col("has_query")).alias("q"),
                        F.sum(F.col("path_depth")).alias("depth")
                    ).collect()[0]
                    dq = (comp.where(F.col("domain").isNotNull())
                          .groupBy("domain")
                          .agg(F.count(F.lit(1)).alias("c")).collect()
                          if int(ur["n"]) else [])
                finally:
                    comp.unpersist()
                if int(ur["n"]):
                    url_state["n"] += int(ur["n"])
                    url_state["bad"] += int(ur["bad"])
                    url_state["ok"] += int(ur["ok"])
                    url_state["q"] += int(ur["q"])
                    url_state["depth"] += int(ur["depth"] or 0)
                    for x in dq:
                        domain_counts[x["domain"]] = (
                            domain_counts.get(x["domain"], 0) + x["c"])
            last_folded = epoch_id
            if state_path:
                import shutil
                import pyarrow as pa
                meta = dict(state)
                meta["last_folded"] = epoch_id
                meta["cleaning_section"] = bool(cleaning_section)
                meta["boilerplate_phrases"] = list(
                    boilerplate_phrases or []) or None
                meta["phrase_tok"] = _PHRASE_TOK_VERSION
                meta["url_suffixes"] = (
                    sorted({x.lower().strip(".") for x in url_suffixes})
                    if url_suffixes else None)
                kinds, keys, ns, bins = ["meta"], [_json.dumps(meta)], \
                    [0], [None]
                for k, v in src_counts.items():
                    kinds.append("src"); keys.append(k)
                    ns.append(v); bins.append(None)
                for k, v in lang_counts.items():
                    kinds.append("lang"); keys.append(k)
                    ns.append(v); bins.append(None)
                for k, v in tok_hist.items():
                    kinds.append("tok"); keys.append(str(k))
                    ns.append(v); bins.append(None)
                for k, c in media_counts.items():
                    kinds.append("media"); keys.append(f"{k}:n")
                    ns.append(c[0]); bins.append(None)
                    kinds.append("media"); keys.append(f"{k}:d")
                    ns.append(c[1]); bins.append(None)
                if cleaning_section:
                    for k, v in clean_state.items():
                        kinds.append("clean"); keys.append(k)
                        ns.append(v); bins.append(None)
                if boilerplate_phrases:
                    for i, v in enumerate(bp_counts):
                        kinds.append("bp"); keys.append(str(i))
                        ns.append(v); bins.append(None)
                    kinds.append("bp"); keys.append("any")
                    ns.append(bp_state["any"]); bins.append(None)
                if url_state["n"]:
                    for k, v in url_state.items():
                        kinds.append("url"); keys.append(k)
                        ns.append(v); bins.append(None)
                    for k, v in domain_counts.items():
                        kinds.append("dom"); keys.append(k)
                        ns.append(v); bins.append(None)
                for k in ("h", "hc"):
                    if sketches[k] is not None:
                        kinds.append("sketch"); keys.append(k)
                        ns.append(0); bins.append(sketches[k])
                _pa_write_dir(
                    os.path.join(state_path, f"v{epoch_id}"),
                    pa.table({"kind": kinds, "key": keys,
                              "n": pa.array(ns, pa.int64()),
                              "bin": pa.array(bins, pa.binary())}))
                for v in _versions()[:-1]:
                    shutil.rmtree(os.path.join(state_path, f"v{v}"),
                                  ignore_errors=True)
        _report(spark)

    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def start_ingest_dedup_monitor(stream: DataFrame, old: DataFrame,
                               sink_path: str,
                               state_path: str,
                               checkpoint_path: str | None = None,
                               content_col: str = "text",
                               source_col: str = "source",
                               compact_every: int = 8):
    """Continuous ingest-dedup triage: the streaming twin of
    dedup.incremental_dedup_report. Each micro-batch is scored per
    source against everything seen before — the initial ``old`` corpus
    PLUS every prior epoch's novel content — and the sink always holds
    the cumulative (source, n_new, n_dup_of_old, n_internal_dup,
    n_novel) table.

    State is the seen-content HASH SET, kept as a parquet dataset under
    ``state_path/hashes`` (one 32-char md5 per distinct content — the
    bounded-per-item form of exact cross-batch dedup; there is no
    smaller exact representation, and it lives distributed, never on
    the driver). Per epoch: one distributed (source, hash) count, one
    hash-keyed left join against the state dataset, a bounded per-source
    fold into driver totals, and a distributed append of the epoch's
    novel hashes. Epoch attribution: a copy of PRE-STREAM or
    PRIOR-EPOCH content counts as dup_of_old; extra copies WITHIN the
    batch count as internal_dup — summed over epochs the
    (dup_of_old + internal_dup) and novel totals equal the one-shot
    batch report over the concatenated ingest (tested). Restarts follow
    the versioned-snapshot convention (totals + epoch watermark);
    replayed epochs no-op, and the per-epoch hash append is keyed by
    epoch so a replay overwrites its own directory instead of
    double-counting. The seen-set build EXCLUDES the current epoch's own
    directory, so the hash write is idempotent even when a crash lands
    between the hash write and the totals snapshot (the replayed epoch
    re-scores against exactly the pre-epoch state).

    State compaction: every ``compact_every`` epochs the per-epoch
    directories fold into ONE compacted generation
    (``epoch=initg{N}`` — N is the highest epoch folded in), written
    BEFORE any superseded directory is removed: readers always pick the
    newest generation carrying a _SUCCESS marker plus only the epoch
    dirs above its boundary, so a crash at any point of the fold leaves
    a consistent view. This bounds both the directory count and the
    per-epoch union re-read at ~compact_every datasets regardless of
    stream lifetime."""
    import json as _json
    import os

    totals: dict[str, list[int]] = {}
    last_folded = -1
    spark = stream.sparkSession

    def _versions() -> list[int]:
        base = os.path.join(state_path, "totals")
        if not os.path.isdir(base):
            return []
        return sorted(
            int(n[1:]) for n in os.listdir(base)
            if n.startswith("v") and n[1:].isdigit()
            and os.path.exists(os.path.join(base, n, "_SUCCESS")))

    latest = _versions()
    if latest:
        snap = spark.read.parquet(
            os.path.join(state_path, "totals", f"v{latest[-1]}"))
        for r in snap.collect():
            if r["source"] == "__meta__":
                last_folded = _json.loads(r["meta"])["last_folded"]
            else:
                totals[r["source"]] = [int(r["n_new"]),
                                       int(r["n_dup_of_old"]),
                                       int(r["n_internal_dup"]),
                                       int(r["n_novel"])]

    hashes_dir = os.path.join(state_path, "hashes")

    def _state_dirs(exclude_epoch: int | None = None):
        """(boundary, paths): the newest valid compacted generation
        (``epoch=init`` = boundary -1, ``epoch=initg{N}`` = boundary N)
        plus every valid per-epoch dir ABOVE that boundary, in epoch
        order, excluding ``exclude_epoch`` (the epoch being scored, so
        its own replayed write never feeds its seen set). Validity =
        the _SUCCESS marker — half-written dirs are invisible."""
        names = os.listdir(hashes_dir) if os.path.isdir(hashes_dir) else []

        def ok(n: str) -> bool:
            return os.path.exists(os.path.join(hashes_dir, n, "_SUCCESS"))

        gens: dict[int, str] = {}
        if "epoch=init" in names and ok("epoch=init"):
            gens[-1] = "epoch=init"
        for n in names:
            tail = n[len("epoch=initg"):]
            if n.startswith("epoch=initg") and tail.isdigit() and ok(n):
                gens[int(tail)] = n
        boundary = max(gens) if gens else None
        paths = [gens[boundary]] if boundary is not None else []
        epochs = []
        for n in names:
            tail = n[len("epoch="):]
            if (n.startswith("epoch=") and tail.isdigit() and ok(n)
                    and (boundary is None or int(tail) > boundary)
                    and int(tail) != exclude_epoch):
                epochs.append((int(tail), n))
        paths += [n for _, n in sorted(epochs)]
        return boundary, [os.path.join(hashes_dir, p) for p in paths]

    if _state_dirs()[0] is None:
        (old.where(F.col(content_col).isNotNull())
         .select(F.md5(F.col(content_col)).alias("h")).distinct()
         .write.mode("overwrite")
         .parquet(os.path.join(hashes_dir, "epoch=init")))

    def _write_report() -> None:
        import pyarrow as pa
        from flink_descriptive_stats_spark.streaming.pipeline_stream \
            import _pa_write_dir
        srcs = sorted(totals)
        _pa_write_dir(sink_path, pa.table(
            {"source": srcs,
             "n_new": pa.array([totals[s][0] for s in srcs], pa.int64()),
             "n_dup_of_old": pa.array([totals[s][1] for s in srcs],
                                      pa.int64()),
             "n_internal_dup": pa.array([totals[s][2] for s in srcs],
                                        pa.int64()),
             "n_novel": pa.array([totals[s][3] for s in srcs],
                                 pa.int64())}))

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal last_folded
        if epoch_id > last_folded:
            seen = spark.read.parquet(
                *_state_dirs(exclude_epoch=epoch_id)[1]).withColumn(
                "__in_old", F.lit(1))
            d = (batch_df.where(F.col(content_col).isNotNull())
                 .select(F.col(source_col).alias("source"),
                         F.md5(F.col(content_col)).alias("h")))
            # per_hash feeds BOTH the totals aggregate and the novel-hash
            # write; persisted for the epoch so the batch scan + seen
            # join run once, not twice (MEMORY_AND_DISK: spills, never
            # OOMs — state is (source, hash, n) rows, bounded by the
            # batch's distinct content)
            from pyspark import StorageLevel
            per_hash = (d.groupBy("source", "h")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .join(seen, "h", "left")
                        .persist(StorageLevel.MEMORY_AND_DISK))
            is_old = F.col("__in_old").isNotNull()
            rows = (per_hash.groupBy("source")
                    .agg(F.sum("n").alias("a"),
                         F.coalesce(F.sum(F.when(is_old, F.col("n"))),
                                    F.lit(0)).alias("b"),
                         F.coalesce(F.sum(F.when(~is_old,
                                                 F.col("n") - 1)),
                                    F.lit(0)).alias("c"),
                         F.count_if(~is_old).alias("dd"))).collect()
            novel = (per_hash.where(~is_old).select("h").distinct())
            novel.write.mode("overwrite").parquet(
                os.path.join(hashes_dir, f"epoch={epoch_id}"))
            per_hash.unpersist()
            for r in rows:
                t = totals.setdefault(r["source"], [0, 0, 0, 0])
                t[0] += int(r["a"]); t[1] += int(r["b"])
                t[2] += int(r["c"]); t[3] += int(r["dd"])
            last_folded = epoch_id
            import pyarrow as pa
            from flink_descriptive_stats_spark.streaming.pipeline_stream \
                import _pa_write_dir
            srcs = sorted(totals) + ["__meta__"]
            meta = _json.dumps({"last_folded": epoch_id})
            _pa_write_dir(
                os.path.join(state_path, "totals", f"v{epoch_id}"),
                pa.table({
                    "source": srcs,
                    "n_new": pa.array(
                        [totals.get(s, [0] * 4)[0] for s in srcs],
                        pa.int64()),
                    "n_dup_of_old": pa.array(
                        [totals.get(s, [0] * 4)[1] for s in srcs],
                        pa.int64()),
                    "n_internal_dup": pa.array(
                        [totals.get(s, [0] * 4)[2] for s in srcs],
                        pa.int64()),
                    "n_novel": pa.array(
                        [totals.get(s, [0] * 4)[3] for s in srcs],
                        pa.int64()),
                    "meta": [meta if s == "__meta__" else ""
                             for s in srcs]}))
            import shutil
            for v in _versions()[:-1]:
                shutil.rmtree(
                    os.path.join(state_path, "totals", f"v{v}"),
                    ignore_errors=True)
            # generational compaction: once the epoch-dir count crosses
            # the bound, fold generation + epochs (current included)
            # into one new generation; only after its _SUCCESS lands do
            # the superseded dirs go away (best-effort — leftovers are
            # below the new boundary and invisible to readers)
            boundary, paths = _state_dirs()
            if compact_every and len(paths) - 1 >= compact_every:
                gen_dir = os.path.join(hashes_dir,
                                       f"epoch=initg{epoch_id}")
                (spark.read.parquet(*paths).select("h").distinct()
                 .write.mode("overwrite").parquet(gen_dir))
                for n in os.listdir(hashes_dir):
                    if n != f"epoch=initg{epoch_id}":
                        shutil.rmtree(os.path.join(hashes_dir, n),
                                      ignore_errors=True)
        _write_report()

    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def _index_append_emitter(index_path: str, offset: int,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          compact_every: int | None = None):
    """The foreachBatch body of start_index_append_stream, factored out
    so tests can drive it directly with a pinned epoch id (the
    crash-replay simulation). Each micro-batch encodes with the index's
    STORED books/centroids and lands in its own ``codes/epoch=offset +
    epoch_id`` directory with OVERWRITE semantics — the write itself is
    the idempotency mechanism (a replayed epoch rewrites its own
    directory; no watermark race, no double count), the same epoch-keyed
    discipline as the ingest-dedup monitor's per-epoch hash dirs.

    ``compact_every``: generational compaction, the same discipline the
    ingest-dedup monitor applies to its hash state — once the append-
    epoch count reaches the bound, fold base + COMMITTED epochs into a
    fresh base via compact_index(keep_epochs_from=current epoch). The
    just-written epoch stays a live directory because its checkpoint
    commit has not happened yet: a crash between this fold and the
    commit replays the batch into its own (kept) directory, never
    double-counting against the folded base. Search results are
    unchanged by construction (compaction is a pure layout rewrite)."""
    import json
    import os

    from flink_descriptive_stats_spark.functions.fsio import get_fs
    from flink_descriptive_stats_spark.operators import similarity as S

    # scheme-less paths resolve to LocalFS without a session; the live
    # session in emit() is used for any scheme'd (HDFS/S3) index path
    _meta_path = os.path.join(index_path, "meta.json")

    def _is_ivf(spark=None) -> bool:
        from flink_descriptive_stats_spark.functions.fsio import \
            read_text_recovering
        fs = get_fs(index_path, spark)
        return "cells" in json.loads(read_text_recovering(fs, _meta_path))

    is_ivf = None if "://" in index_path else _is_ivf()

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivf = (is_ivf if is_ivf is not None
               else _is_ivf(batch_df.sparkSession))
        e = offset + int(epoch_id)
        if ivf:
            S.append_ivf_pq_index(batch_df, index_path, id_col=id_col,
                                  vec_col=vec_col, epoch=e)
        else:
            S.append_pq_index(batch_df, index_path, id_col=id_col,
                              vec_col=vec_col, epoch=e)
        if compact_every:
            epochs = S._codes_epochs(
                index_path, get_fs(index_path, batch_df.sparkSession))
            if len(epochs) - 1 >= compact_every:
                S.compact_index(batch_df.sparkSession, index_path,
                                keep_epochs_from=e)

    return emit


def start_index_append_stream(stream: DataFrame, index_path: str,
                              checkpoint_path: str | None = None,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              compact_every: int | None = None):
    """Continuous ANN-index maintenance: grow a persisted PQ or IVF-PQ
    index (write_pq_index / write_ivf_pq_index) from a vector stream —
    the daily-ingest path as a foreachBatch sink. The index kind is read
    from the sidecar; every micro-batch is encoded with the STORED
    codebooks (and assigned with the stored centroids for IVF-PQ), never
    retrained, so the grown index searches EXACTLY like a batch
    append of the union (pytest-pinned) and pq_index_calibration /
    index_stats remain the drift watchdogs.

    Replay discipline: micro-batch N writes ``codes/epoch=offset+N``
    with overwrite — a crash between the write and the checkpoint commit
    replays N into the SAME directory (idempotent by construction). The
    per-run ``offset`` maps Structured Streaming's checkpoint-scoped
    epoch ids into the index's global epoch space: it is allocated once
    per checkpoint (max existing epoch + 1 at first attach) and pinned
    in ``stream_runs.json`` (write-then-rename), so restarts of the same
    checkpoint reuse it while a later, different stream gets fresh
    directories. WITHOUT a checkpoint there is no replay identity to key
    on (epoch ids restart at 0 every run), so the offset is allocated
    fresh at every start and never persisted — two successive
    uncheckpointed runs land in disjoint directory ranges instead of the
    second silently overwriting the first (the idempotent-replay
    guarantee itself still requires a checkpoint). Caller contract (same
    as the batch appends): streamed ids are disjoint from stored ids,
    and one writer grows an index at a time.

    ``compact_every`` (r8): bound the epoch-directory debt IN the sink —
    once the append-epoch count reaches the bound, committed epochs fold
    into a fresh base while the current (uncommitted) epoch stays live,
    so crash replay remains idempotent (see _index_append_emitter). A
    long-lived stream then holds the index at O(compact_every) epoch
    dirs instead of one per micro-batch — the same generational
    discipline as the ingest-dedup monitor's hash state."""
    import json
    import os

    from flink_descriptive_stats_spark.functions.fsio import get_fs
    from flink_descriptive_stats_spark.operators.similarity import \
        _codes_epochs

    fs = get_fs(index_path, stream.sparkSession)
    if checkpoint_path is None:
        # No checkpoint means Structured Streaming restarts epoch ids at
        # 0 on EVERY start and gives no replay guarantee to key on — a
        # persisted offset would make a second uncheckpointed run reuse
        # the first run's directories and silently overwrite its codes.
        # Allocate a FRESH offset per start (max committed epoch + 1)
        # and never persist it: each run gets its own directory range.
        epochs = _codes_epochs(index_path, fs)
        offset = (epochs[-1] + 1) if epochs else 0
    else:
        runs_path = os.path.join(index_path, "stream_runs.json")
        runs: dict = {}
        # r10: heal the delete-then-rename crash window (a missing
        # stream_runs.json whose complete .tmp survives) instead of
        # silently re-keying every attached stream from scratch
        from flink_descriptive_stats_spark.functions.fsio import \
            read_text_recovering
        if fs.exists(runs_path) or fs.exists(runs_path + ".tmp"):
            runs = json.loads(read_text_recovering(fs, runs_path))
        key = (checkpoint_path if "://" in checkpoint_path
               else os.path.abspath(checkpoint_path))
        if key not in runs:
            epochs = _codes_epochs(index_path, fs)
            runs[key] = (epochs[-1] + 1) if epochs else 0
            fs.write_text_atomic(runs_path, json.dumps(runs))
        offset = int(runs[key])
    emit = _index_append_emitter(index_path, offset,
                                 id_col=id_col, vec_col=vec_col,
                                 compact_every=compact_every)
    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def start_refint_monitor(stream: DataFrame, dim: DataFrame,
                         fk: str, pk: str, sink_path: str,
                         state_path: str | None = None,
                         checkpoint_path: str | None = None):
    """Continuous referential-integrity monitoring — the streaming twin
    of extras.referential_integrity and the dependency family's bridge
    into the monitor suite: each micro-batch of fact rows is scored
    against a STATIC dim's key set, and the sink always holds the
    cumulative (fk_rows, null_fk, matched, orphans, orphan_fraction)
    row over everything seen — the "did the upstream feed start
    shipping dangling keys" alarm, running next to the constraint and
    drift monitors.

    All four counters are sums, so after N batches the report equals
    batch referential_integrity over the concatenated stream for every
    shared column (pinned). ``distinct_orphan_keys`` is deliberately
    ABSENT: exact cross-batch key distinctness is not a bounded monoid
    — the same boundary the constraint monitor declares for `unique`
    rules; run the batch operator for it.

    Per batch: the dim collapses to its DISTINCT key once (computed
    lazily per batch against the static frame — AQE broadcasts a
    dim-scale key set), one left join keyed by the fk, one aggregate.
    State is a handful of integers; durability follows the versioned-
    epoch contract of the sibling monitors (restart-lossless,
    replay-idempotent, config-mismatch refused)."""
    import json as _json
    import os
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    if (state_path is None) != (checkpoint_path is None):
        raise ValueError(
            "state_path and checkpoint_path must be passed together (see "
            "start_global_topk_sketch)")
    totals = {"fk_rows": 0, "null_fk": 0, "matched": 0, "orphans": 0}
    last_folded = -1

    def _versions() -> list[int]:
        if not (state_path and os.path.isdir(state_path)):
            return []
        return sorted(
            int(n[1:]) for n in os.listdir(state_path)
            if n.startswith("v") and n[1:].isdigit()
            and os.path.exists(os.path.join(state_path, n, "_SUCCESS")))

    latest = _versions()
    if latest:
        snap = stream.sparkSession.read.parquet(
            os.path.join(state_path, f"v{latest[-1]}")).collect()[0]
        meta = _json.loads(snap["meta"])
        if meta["keys"] != [fk, pk]:
            raise ValueError(
                f"snapshot at {state_path} was built for keys "
                f"{meta['keys']}; refusing to merge into ({fk}, {pk})")
        last_folded = meta["last_folded"]
        for k in totals:
            totals[k] = int(snap[k])

    def _write_report() -> None:
        import pyarrow as pa
        frac = (sig6_py(totals["orphans"] / totals["fk_rows"])
                if totals["fk_rows"] else None)
        _pa_write_dir(sink_path, pa.table({
            "fk_rows": pa.array([totals["fk_rows"]], pa.int64()),
            "null_fk": pa.array([totals["null_fk"]], pa.int64()),
            "matched": pa.array([totals["matched"]], pa.int64()),
            "orphans": pa.array([totals["orphans"]], pa.int64()),
            "orphan_fraction": pa.array([frac], pa.string())}))

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal last_folded
        if epoch_id > last_folded:
            keys = (dim.select(F.col(pk).alias("__k"))
                    .where(F.col("__k").isNotNull()).distinct()
                    .withColumn("__hit", F.lit(1)))
            j = batch_df.select(F.col(fk).alias("__fk")).join(
                keys, F.col("__fk") == F.col("__k"), "left")
            fknn = F.col("__fk").isNotNull()
            r = j.agg(
                F.count(F.when(fknn, F.lit(1))).alias("fk_rows"),
                F.count(F.when(~fknn, F.lit(1))).alias("null_fk"),
                F.count(F.when(fknn & F.col("__hit").isNotNull(),
                               F.lit(1))).alias("matched"),
                F.count(F.when(fknn & F.col("__hit").isNull(),
                               F.lit(1))).alias("orphans")).collect()[0]
            for k in totals:
                totals[k] += int(r[k])
            last_folded = epoch_id
            if state_path:
                import shutil
                import pyarrow as pa
                cols = {k: pa.array([totals[k]], pa.int64())
                        for k in sorted(totals)}
                cols["meta"] = [_json.dumps(
                    {"keys": [fk, pk], "last_folded": epoch_id})]
                _pa_write_dir(os.path.join(state_path, f"v{epoch_id}"),
                              pa.table(cols))
                for v in _versions()[:-1]:
                    shutil.rmtree(os.path.join(state_path, f"v{v}"),
                                  ignore_errors=True)
        _write_report()

    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def finalize_delta_monitor(old: DataFrame, sink_path: str,
                           state_path: str,
                           id_col: str = "doc_id",
                           content_cols: tuple[str, ...] = ("text",)):
    """Close a start_delta_monitor snapshot (r11, VERDICT r10 ask #6):
    once the caller declares the 'new run' stream COMPLETE (query
    stopped), compute the one quantity that was undecidable mid-stream
    — ``removed`` = old ids never seen — with ONE anti-join of the old
    keys against the accumulated per-epoch seen-id state, and rewrite
    the sink as the full 4-status report with batch ``delta_summary``
    semantics: ``share`` over the union-of-snapshots denominator
    (added + changed + unchanged + removed, equal under the unique-id
    contract). Returns the report as a list of (status, n, share)
    tuples in delta.STATUSES order.

    Requires the monitor to have run WITH ``state_path`` (the seen-id
    state is disk-backed parquet, never driver memory); refuses a
    state built for a different identity. Safe across restarts:
    replayed epochs overwrite their own ids dir, so the union of
    ``ids/e*`` is exactly the folded stream."""
    import json as _json
    import os
    import pyarrow as pa
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators.delta import (
        STATUSES, content_hash_expr)
    versions = sorted(
        int(n[1:]) for n in
        (os.listdir(state_path) if os.path.isdir(state_path) else [])
        if n.startswith("v") and n[1:].isdigit()
        and os.path.exists(os.path.join(state_path, n, "_SUCCESS")))
    if not versions:
        raise ValueError(
            f"no folded delta-monitor state at {state_path}; run "
            "start_delta_monitor with state_path first")
    snap = old.sparkSession.read.parquet(
        os.path.join(state_path, f"v{versions[-1]}")).collect()[0]
    meta = _json.loads(snap["meta"])
    if meta["identity"] != [id_col, list(content_cols)]:
        raise ValueError(
            f"state at {state_path} was built for identity "
            f"{meta['identity']}; refusing to finalize")
    totals = {k: int(snap[k]) for k in ("added", "changed", "unchanged")}
    ids_root = os.path.join(state_path, "ids")
    epoch_dirs = sorted(
        os.path.join(ids_root, d) for d in
        (os.listdir(ids_root) if os.path.isdir(ids_root) else [])
        if d.startswith("e")
        and os.path.exists(os.path.join(ids_root, d, "_SUCCESS")))
    okeys = old.select(F.col(id_col).alias("id")).distinct()
    if epoch_dirs:
        seen = old.sparkSession.read.parquet(*epoch_dirs)
        removed = okeys.join(seen, "id", "anti").count()
    else:
        removed = okeys.count()
    totals["removed"] = removed
    tot = sum(totals.values())
    rows = [(s, totals[s], sig6_py(totals[s] / tot) if tot else None)
            for s in STATUSES]
    _pa_write_dir(sink_path, pa.table({
        "status": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "share": pa.array([r[2] for r in rows], pa.string())}))
    return rows


def start_delta_monitor(stream: DataFrame, old: DataFrame,
                        sink_path: str,
                        state_path: str | None = None,
                        checkpoint_path: str | None = None,
                        id_col: str = "doc_id",
                        content_cols: tuple[str, ...] = ("text",)):
    """Continuous snapshot-delta monitoring — the streaming twin of
    delta.corpus_delta: each micro-batch of 'new run' documents is
    scored against the STATIC old snapshot's (id, content-md5) frame
    and the sink holds cumulative (status, n, share) rows for
    ``added`` / ``changed`` / ``unchanged`` — the live "how much of
    this re-crawl is actually new" view. ``share`` is over rows SEEN
    (the three streamable statuses), not the batch operator's
    union-of-snapshots denominator, which needs the removed count.

    ``removed`` is deliberately ABSENT mid-stream: on an unbounded
    stream "old ids never seen again" is undecidable (any absence may
    end with the next batch) — the same declared-boundary discipline
    as the card monitor's cluster row and the refint monitor's
    distinct-orphan count. r11 closes the loop at END of stream:
    when ``state_path`` is set, each folded epoch also persists its
    distinct batch ids under ``state_path/ids/e{epoch}`` (8-byte id
    rows, disk-backed — never driver memory), and once the caller
    declares the snapshot complete (stream stopped), ONE call to
    ``finalize_delta_monitor`` anti-joins the old keys against the
    accumulated seen ids and writes the full 4-status report matching
    batch ``delta_summary`` (union-of-snapshots denominator) — no
    monoid faked, the undecidable quantity computed exactly once when
    it becomes decidable. Counters are sums under corpus_delta's own
    unique-id-per-snapshot contract (ids must not repeat across the
    stream; keep_first upstream is the remediation).

    Per batch: the batch projects to (id, md5) exactly like the batch
    operator (text never shuffles), one left join against the old
    key-hash frame, one aggregate. Versioned-epoch durability;
    restarts refuse a snapshot built for different identity columns."""
    import json as _json
    import os
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators.delta import \
        content_hash_expr
    if (state_path is None) != (checkpoint_path is None):
        raise ValueError(
            "state_path and checkpoint_path must be passed together (see "
            "start_global_topk_sketch)")
    totals = {"added": 0, "changed": 0, "unchanged": 0}
    last_folded = -1
    okeys = old.select(F.col(id_col).alias("__id"),
                       content_hash_expr(content_cols).alias("__ho"))

    def _versions() -> list[int]:
        if not (state_path and os.path.isdir(state_path)):
            return []
        return sorted(
            int(n[1:]) for n in os.listdir(state_path)
            if n.startswith("v") and n[1:].isdigit()
            and os.path.exists(os.path.join(state_path, n, "_SUCCESS")))

    latest = _versions()
    if latest:
        snap = stream.sparkSession.read.parquet(
            os.path.join(state_path, f"v{latest[-1]}")).collect()[0]
        meta = _json.loads(snap["meta"])
        if meta["identity"] != [id_col, list(content_cols)]:
            raise ValueError(
                f"snapshot at {state_path} was built for identity "
                f"{meta['identity']}; refusing to merge")
        last_folded = meta["last_folded"]
        for k in totals:
            totals[k] = int(snap[k])

    def _write_report() -> None:
        import pyarrow as pa
        tot = sum(totals.values())
        rows = [(s, totals[s],
                 sig6_py(totals[s] / tot) if tot else None)
                for s in ("added", "changed", "unchanged")]
        _pa_write_dir(sink_path, pa.table({
            "status": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "share": pa.array([r[2] for r in rows], pa.string())}))

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal last_folded
        if epoch_id > last_folded:
            b = batch_df.select(
                F.col(id_col).alias("__id"),
                content_hash_expr(content_cols).alias("__hn"))
            j = b.join(okeys, "__id", "left")
            r = j.agg(
                F.count(F.when(F.col("__ho").isNull(), 1))
                .alias("added"),
                F.count(F.when(F.col("__ho").isNotNull()
                               & (F.col("__ho") != F.col("__hn")), 1))
                .alias("changed"),
                F.count(F.when(F.col("__ho") == F.col("__hn"), 1))
                .alias("unchanged")).collect()[0]
            for k in totals:
                totals[k] += int(r[k])
            if state_path:
                import shutil
                import pyarrow as pa
                # seen ids FIRST (finalize's removed input), counters +
                # meta second: a crash between re-folds the epoch on
                # restart and overwrites the ids dir — idempotent
                (b.select(F.col("__id").alias("id")).distinct()
                 .write.mode("overwrite").parquet(
                     os.path.join(state_path, "ids", f"e{epoch_id}")))
                cols = {k: pa.array([totals[k]], pa.int64())
                        for k in sorted(totals)}
                cols["meta"] = [_json.dumps(
                    {"identity": [id_col, list(content_cols)],
                     "last_folded": epoch_id})]
                _pa_write_dir(os.path.join(state_path, f"v{epoch_id}"),
                              pa.table(cols))
                for v in _versions()[:-1]:
                    shutil.rmtree(os.path.join(state_path, f"v{v}"),
                                  ignore_errors=True)
            last_folded = epoch_id
        _write_report()

    writer = stream.writeStream.outputMode("append").foreachBatch(emit)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()
