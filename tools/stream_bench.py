"""Streaming throughput bench (VERDICT r4 item #4; BASELINE.md streaming
target "sustained >= input rate, state bounded by watermark").

Replays the events table as a rate-limited file stream — repartitionByRange
on ts into N sequential files whose mtimes increase with event time, so
FileStreamSource (oldest-first) delivers an IN-ORDER replay and the
watermark advances exactly as it would against a live source — through
three continuous operators:

- ``windowed_profile`` (windowed aggregation state, append mode): state is
  one row per OPEN window, bounded by watermark eviction, independent of
  input volume.
- ``streaming_exact_dedup`` (dropDuplicatesWithinWatermark key state):
  state is the keys inside the watermark horizon, evicted as event time
  advances — NOT the full key history.
- ``start_constraint_monitor`` (foreachBatch running totals): no
  store-managed state at all — one distributed aggregate per epoch folds
  into O(rules) driver counters.

Reported per operator: sustained processed rows/sec (total rows / total
trigger-execution time), per-epoch state rows/bytes, and the peak state
size. Run as a script for the sf0.1 numbers (one JSON line on stdout);
tests import ``run_stream_bench`` at a smaller scale for the regression
bar.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _replay_dir(spark, sf_dir: str, out_dir: str, n_files: int):
    """Materialize the events table as n_files time-ordered parquet files
    with strictly increasing mtimes (the file source's discovery order)."""
    from pyspark.sql import functions as F
    from flink_descriptive_stats_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    (ev.repartitionByRange(n_files, F.col("ts"))
     .write.mode("overwrite").parquet(out_dir))
    parts = sorted(p for p in os.listdir(out_dir) if p.endswith(".parquet"))
    base = time.time() - len(parts) - 10
    for i, p in enumerate(parts):
        os.utime(os.path.join(out_dir, p), (base + i, base + i))
    return ev.schema


def _drain(query) -> dict:
    """Process the whole replay and fold recentProgress into metrics."""
    query.processAllAvailable()
    rows = 0
    exec_ms = 0.0
    state_rows: list[int] = []
    state_bytes: list[int] = []
    for p in query.recentProgress:
        if p is None:
            continue
        if p["numInputRows"]:
            rows += p["numInputRows"]
            exec_ms += p["durationMs"].get("triggerExecution", 0)
        for so in p.get("stateOperators") or []:
            state_rows.append(so["numRowsTotal"])
            state_bytes.append(so["memoryUsedBytes"])
    return {
        "rows": rows,
        "exec_sec": round(exec_ms / 1000.0, 3),
        "rows_per_sec": round(rows / (exec_ms / 1000.0), 1) if exec_ms
        else None,
        "n_epochs": sum(1 for p in query.recentProgress
                        if p and p["numInputRows"]),
        "state_rows_peak": max(state_rows, default=0),
        "state_rows_final": state_rows[-1] if state_rows else 0,
        "state_mb_peak": round(max(state_bytes, default=0) / 2**20, 2),
    }


def run_stream_bench(spark, sf_dir: str, scratch: str,
                     n_files: int = 20, files_per_trigger: int = 2) -> dict:
    from flink_descriptive_stats_spark.sources.tables import stream_table
    from flink_descriptive_stats_spark.streaming.pipeline_stream import (
        streaming_exact_dedup)
    from flink_descriptive_stats_spark.streaming.profile_stream import (
        windowed_profile)

    replay = os.path.join(scratch, "events_replay")
    _replay_dir(spark, sf_dir, replay, n_files)

    def stream():
        return stream_table(spark, replay, "events",
                            maxFilesPerTrigger=files_per_trigger)

    out: dict[str, dict] = {}

    prof = windowed_profile(stream(), window="6 hours", watermark="1 hour")
    q = (prof.writeStream.format("memory").queryName("sb_profile")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(scratch, "ckpt_prof"))
         .start())
    try:
        out["windowed_profile"] = _drain(q)
    finally:
        q.stop()

    ded = streaming_exact_dedup(stream(), content_col="props", ts_col="ts",
                                delay="1 hour")
    q = (ded.writeStream.format("noop")
         .option("checkpointLocation", os.path.join(scratch, "ckpt_dedup"))
         .start())
    try:
        out["exact_dedup"] = _drain(q)
    finally:
        q.stop()

    # continuous data-quality monitoring: one distributed aggregate per
    # micro-batch folded into O(rules) driver totals — the streaming
    # operator whose state does NOT grow with keys or windows at all
    from flink_descriptive_stats_spark.streaming.pipeline_stream import (
        start_constraint_monitor)
    rules = [("not_null", "value"), ("in_range", "value", 0.0, 50.0),
             ("in_set", "event_type",
              ("view", "click", "purchase", "signup", "error"))]
    q = start_constraint_monitor(
        stream(), rules, os.path.join(scratch, "cc_sink"),
        state_path=os.path.join(scratch, "cc_state"),
        checkpoint_path=os.path.join(scratch, "ckpt_cc"))
    try:
        out["constraint_monitor"] = _drain(q)
    finally:
        q.stop()

    # windowed quantiles on the GK approx_percentile path — the bounded
    # mergeable sketch state the operator ships for streams
    from flink_descriptive_stats_spark.streaming.profile_stream import (
        windowed_quantiles)
    wq = windowed_quantiles(stream(), window="6 hours", watermark="1 hour",
                            exact=False)
    q = (wq.writeStream.format("noop").outputMode("append")
         .option("checkpointLocation", os.path.join(scratch, "ckpt_wq"))
         .start())
    try:
        out["windowed_quantiles_gk"] = _drain(q)
    finally:
        q.stop()

    # session-window state: merged-session rows, evicted past the
    # watermark — the fourth stateful-operator class measured
    from flink_descriptive_stats_spark.streaming.pipeline_stream import (
        sessionize)
    sess = sessionize(stream(), watermark="1 hour")
    q = (sess.writeStream.format("noop").outputMode("append")
         .option("checkpointLocation", os.path.join(scratch, "ckpt_sess"))
         .start())
    try:
        out["sessionize"] = _drain(q)
    finally:
        q.stop()

    # ingest-dedup monitor with generational state compaction: the
    # distributed hash-set state is folded every compact_every epochs, so
    # the per-epoch union re-read stays bounded for any stream lifetime —
    # the first-half vs second-half mean epoch duration is reported to
    # show the per-epoch cost staying flat as epochs accumulate
    from pyspark.sql import functions as F

    from flink_descriptive_stats_spark.sources.tables import load_table
    from flink_descriptive_stats_spark.streaming.pipeline_stream import (
        start_ingest_dedup_monitor)
    docs = load_table(spark, sf_dir, "documents")
    docs_replay = os.path.join(scratch, "docs_replay")
    (docs.where(F.col("doc_id") % 3 == 0).repartition(n_files)
     .write.parquet(docs_replay))
    dstream = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 1).parquet(docs_replay))
    q = start_ingest_dedup_monitor(
        dstream, docs.where(F.col("doc_id") % 3 != 0),
        sink_path=os.path.join(scratch, "ing_sink"),
        state_path=os.path.join(scratch, "ing_state"),
        checkpoint_path=os.path.join(scratch, "ckpt_ing"),
        compact_every=5)
    try:
        m = _drain(q)
        durs = [p["durationMs"].get("triggerExecution", 0)
                for p in q.recentProgress
                if p and p["numInputRows"]]
        if len(durs) >= 4:
            h = len(durs) // 2
            m["epoch_sec_first_half"] = round(
                sum(durs[:h]) / h / 1000.0, 3)
            m["epoch_sec_second_half"] = round(
                sum(durs[h:]) / (len(durs) - h) / 1000.0, 3)
        out["ingest_dedup_monitor"] = m
    finally:
        q.stop()
    return out


def main() -> None:
    import shutil
    import tempfile
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from flink_descriptive_stats_spark.session import get_spark
    spark = get_spark(app_name="stream-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    scratch = tempfile.mkdtemp(prefix="fds_stream_bench_")
    try:
        res = run_stream_bench(spark, sf_dir, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    res["sf_dir"] = sf_dir
    print(json.dumps(res, separators=(",", ":")))


if __name__ == "__main__":
    main()
