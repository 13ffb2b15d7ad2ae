"""End-to-end corpus-curation pipeline: the operators composed the way a
real training-data job chains them, with row accounting asserted at every
stage. Each stage consumes the previous stage's DataFrame — one lineage,
no materialization between stages until the final counts."""

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .appName("curation-pipeline").getOrCreate())
    yield s


def test_full_curation_pipeline(spark):
    from flink_descriptive_stats_spark.operators import dedup, sampling
    from flink_descriptive_stats_spark.operators import text as text_ops
    from flink_descriptive_stats_spark.operators.quality import (
        check_constraints)

    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    assert n0 > 0

    # 1. input contract: ids present+unique, text present, lang declared
    report = {r["rule"]: r for r in check_constraints(docs, [
        ("not_null", "doc_id"), ("unique", "doc_id"),
        ("not_null", "text"),
        ("in_set", "lang", ("en", "de", "fr", "es", "zh")),
    ]).collect()}
    assert report["not_null"]["passed"] and report["unique"]["passed"]

    # 2. exact dedup (keep-first): the fixture word-soup has duplicate
    # texts; dedup must keep exactly one doc per distinct text
    deduped = dedup.keep_first(docs)
    n_dedup = deduped.count()
    n_distinct_text = docs.select("text").distinct().count()
    assert n_dedup == n_distinct_text <= n0

    # 3. decontaminate against a fake holdout = 10 of the surviving docs
    holdout = deduped.limit(10).select("doc_id", "text")
    clean = dedup.decontaminate(deduped, holdout)
    n_clean = clean.count()
    # exact decontamination removes at least the 10 holdout texts
    assert n_clean <= n_dedup - 10

    # 4. quality + LM screens: drop the worst docs by composite quality
    # and the most templated by LM score (here: keep docs with at least
    # one bigram, i.e. lm_score defined)
    scored = text_ops.lm_score(clean)
    kept = clean.join(scored.select("doc_id"), "doc_id")
    n_kept = kept.count()
    assert 0 < n_kept <= n_clean

    # 5. topic-balanced downsample: k docs per hashed-TF cluster
    sample = sampling.cluster_balanced_sample(kept, k_per_cluster=3,
                                              n_clusters=4, dim=32)
    picked = sample.count()
    assert 0 < picked <= 4 * 3
    per_cluster = sample.groupBy("cluster_id").count().collect()
    assert all(r["count"] <= 3 for r in per_cluster)

    # 6. pack the survivors into training sequences; every sampled doc
    # lands in exactly one pack slot
    final = kept.join(sample.select("doc_id"), "doc_id")
    packed = sampling.pack_sequences(final, max_tokens=64)
    assert packed.count() == picked
    assert packed.select("id").distinct().count() == picked
    # offsets within a shard are strictly increasing and gap-free
    rows = sorted((r["shard"], r["start_offset"], r["n_tokens"])
                  for r in packed.collect())
    by_shard = {}
    for shard, off, n in rows:
        by_shard.setdefault(shard, []).append((off, n))
    for seq in by_shard.values():
        expect = 0
        for off, n in seq:
            assert off == expect
            expect += n
