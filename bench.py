"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

All diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from flink_descriptive_stats_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    qs = entrymod.queries()

    # Steady-state warmup: run every query shape once at sf0.001. This warms
    # the JVM (classloading, JIT), the parquet reader, the Arrow python
    # workers, and the janino codegen cache (keyed by generated source, which
    # depends only on the schema — identical across scale factors), so the
    # timed loop below measures execution, not one-time compilation.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        t0 = time.perf_counter()
        for name, fn in qs.items():
            try:
                fn(spark, warm_dir).collect()
            except Exception as e:
                print(f"warmup {name}: FAILED {e}", file=sys.stderr)
        print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        # drain warmup garbage before timing — a major GC landing inside a
        # timed query adds seconds of pure noise
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            n = len(fn(spark, sf_dir).collect())
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"bench {name}: {times[name]}s rows={n}", file=sys.stderr)
        except Exception as e:  # a failing query must not kill the bench
            times[name] = -1.0
            print(f"bench {name}: FAILED {e}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    # one COMPACT line (no spaces, 2-decimal times): round 1's driver capture
    # front-truncated a longer line, losing the total and first queries
    payload = {
        "metric": "total_runtime_all_queries",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in times.items()},
        "sf": sf,
    }
    print(json.dumps(payload, separators=(",", ":")))


if __name__ == "__main__":
    main()
