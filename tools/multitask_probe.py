"""Multi-file scan probe for the documents pipelines (VERDICT r4 item #8).

The sf* fixtures write each table as ONE parquet row-group, so a scan is a
single task and every narrow stage downstream of it runs serially until
the first shuffle — the bench then measures serial I/O+compute, not the
plan. This probe repartitions documents into n_files files (identical
rows) and times the LLM-pipeline operators against both copies, min-of-2
with memos cleared, printing one JSON line: the direct measurement that
these operators scale with partition count (the 1000-executor story), as
profile_lineitem_multitask already shows for the flagship profile.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_files = int(os.environ.get("SPARK_GRAFT_PROBE_FILES", "32"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql.functions import col as spark_col

    from flink_descriptive_stats_spark.functions.memo import clear_all_memos
    from flink_descriptive_stats_spark.operators import dedup, topk
    from flink_descriptive_stats_spark.operators import text as text_ops
    from flink_descriptive_stats_spark.session import get_spark
    from flink_descriptive_stats_spark.sources.tables import load_table

    spark = get_spark(app_name="multitask-probe", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    import tempfile
    multi_dir = os.path.join(tempfile.gettempdir(),
                             f"fds_probe_{os.getpid()}")
    (load_table(spark, sf_dir, "documents").repartition(n_files)
     .write.mode("overwrite").parquet(f"{multi_dir}/documents.parquet"))

    ops = {
        "topk_documents": lambda df: topk.topk_tokens(df),
        "text_stats": lambda df: text_ops.text_stats(df),
        "minhash_pairs": lambda df: dedup.minhash_dedup_pairs(df),
        "repetition_stats": lambda df: text_ops.repetition_stats(df),
    }
    out: dict[str, dict] = {}
    for name, fn in ops.items():
        rec: dict[str, float] = {}
        for label, d in (("single", sf_dir), ("multi", multi_dir)):
            best = None
            rows = None
            for _ in range(2):
                clear_all_memos()
                df = load_table(spark, d, "documents")
                t0 = time.perf_counter()
                rows = len(fn(df).collect())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rec[label] = round(best, 2)
            rec[f"{label}_rows"] = rows
        rec["speedup"] = round(rec["single"] / rec["multi"], 2)
        out[name] = rec
        print(f"probe {name}: {rec}", file=sys.stderr)

    # Persisted IVF-PQ index BUILD (VERDICT r6 next-round #7): the one
    # index phase whose cost scales with corpus size is the fused
    # assign+encode Arrow pass inside write_ivf_pq_index (training is
    # bounded, search reads only probed cells) — measure that it
    # parallelizes across input files. The sf fixtures' embeddings table
    # is small (2k rows at sf0.1), so the probe replicates it 32x with
    # disjoint ids to give the encode pass real work, then times the
    # build against a 1-file and an n_files-file copy of the SAME rows.
    from flink_descriptive_stats_spark.operators import similarity
    emb = load_table(spark, sf_dir, "embeddings")
    rep = spark.range(32).crossJoin(emb).select(
        (spark_col("vec_id") * 32 + spark_col("id")).alias("vec_id"),
        "embedding")
    for label, n in (("single", 1), ("multi", n_files)):
        (rep.repartition(n).write.mode("overwrite")
         .parquet(f"{multi_dir}/emb_{label}.parquet"))
    rec = {}
    for label in ("single", "multi"):
        best = None
        for _ in range(2):
            clear_all_memos()
            df = spark.read.parquet(f"{multi_dir}/emb_{label}.parquet")
            idx = f"{multi_dir}/idx_{label}"
            t0 = time.perf_counter()
            similarity.write_ivf_pq_index(df, idx)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rec[label] = round(best, 2)
        rec[f"{label}_rows"] = rep.count()
    rec["speedup"] = round(rec["single"] / rec["multi"], 2)
    out["ivf_pq_index_build"] = rec
    print(f"probe ivf_pq_index_build: {rec}", file=sys.stderr)
    import shutil
    shutil.rmtree(multi_dir, ignore_errors=True)
    print(json.dumps({"n_files": n_files, "sf_dir": sf_dir, "ops": out},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
