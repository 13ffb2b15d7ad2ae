"""Deduplication operators for large-scale (training-data) pipelines.

Five dedup families, all Spark-first and (except where noted) verifiable
against the DuckDB oracle because every hash is md5-derived
(functions/hashing.py):

- exact:       hash-groupBy on content — one shuffle keyed by md5(text); at
               100 TB the md5 key keeps shuffle rows small vs full text.
- MinHash+LSH: shingle -> minhash signature (single pass, per-row array
               math, no shuffle) -> band explode -> bucket self-join
               (shuffle keyed by (band, band_key) — candidate generation
               touches only bucket-mates, never all pairs) -> exact Jaccard
               verification on the candidates.
- SimHash:     per-doc 32-bit signature from token hashes (single pass);
               near-dups = signatures at small Hamming distance.
- n-gram Jaccard: exact all-shared-shingle pair counts via explode +
               groupBy(pair) — the exact (non-probabilistic) baseline for
               LSH; quadratic in bucket size, linear in shared shingles.
- embedding near-dup: cosine > threshold over the embeddings table (see
               operators/similarity.py for the top-k variant).

Scale notes: signatures/bands are O(rows); the only quadratic step is within
LSH buckets (by construction small). Skewed buckets (e.g. empty-text
boilerplate) would hot-spot the band join — mitigated by capping bucket
width (drop buckets with > max_bucket docs, configurable; dropped buckets
are boilerplate clusters that get exact-dedup'd by the md5 path anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.functions import hashing as H


def exact_dedup(df: DataFrame, content_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: (content_md5, rep_id = min id,
    dup_count). A downstream keep-one filter is a semi-join on rep_id."""
    return (df.groupBy(F.md5(F.col(content_col)).alias("content_md5"))
            .agg(F.min(F.col(id_col)).alias("rep_id"),
                 F.count(F.lit(1)).alias("dup_count")))


def _with_shingle_hashes(df: DataFrame, content_col: str,
                         n: int = 3) -> DataFrame:
    toks = H.tokens_expr(F.col(content_col))
    return (df.withColumn("__toks", toks)
            .withColumn("__shingles",
                        F.array_distinct(F.expr(H.shingles_sql("__toks", n))))
            .withColumn("__hashes",
                        F.transform(F.col("__shingles"),
                                    lambda s: F.pmod(H.token_hash(s),
                                                     F.lit(H.MERSENNE_P)))))


def minhash_signatures(df: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """MinHash signatures, long format: (id, sig_idx, sig_val).

    Single pass, per-row array math — no shuffle. k=16 permutations over
    md5-derived shingle hashes (see functions/hashing.py for the exact
    arithmetic, shared with the oracle)."""
    d = _with_shingle_hashes(df, content_col, n)
    sig_cols = [
        F.array_min(F.transform(
            F.col("__hashes"),
            lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(H.MERSENNE_P)
        )).alias(f"sig_{j}")
        for j, (a, b) in enumerate(H.MINHASH_PARAMS)
    ]
    wide = d.select(F.col(id_col).alias("id"), *sig_cols)
    structs = F.array(*[
        F.struct(F.lit(j).alias("sig_idx"), F.col(f"sig_{j}").alias("sig_val"))
        for j in range(H.MINHASH_K)])
    return (wide.select("id", F.explode(structs).alias("s"))
            .select("id", "s.sig_idx", "s.sig_val"))


def _banded(df: DataFrame, content_col: str, id_col: str,
            n: int = 3) -> DataFrame:
    """(id, band, band_key) — one row per LSH band."""
    d = _with_shingle_hashes(df, content_col, n)
    sig_cols = [
        F.array_min(F.transform(
            F.col("__hashes"),
            lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(H.MERSENNE_P)
        )).alias(f"sig_{j}")
        for j, (a, b) in enumerate(H.MINHASH_PARAMS)
    ]
    wide = d.select(F.col(id_col).alias("id"), *sig_cols)
    bands = []
    for b in range(H.LSH_BANDS):
        key = F.concat_ws(
            ",", *[F.col(f"sig_{b * H.LSH_ROWS + r}").cast("string")
                   for r in range(H.LSH_ROWS)])
        bands.append(F.struct(F.lit(b).alias("band"), key.alias("band_key")))
    return (wide.select("id", F.explode(F.array(*bands)).alias("s"))
            .select("id", "s.band", "s.band_key"))


def minhash_dedup_pairs(df: DataFrame, content_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate pairs: LSH candidate generation + exact Jaccard
    verification. Output: (id_a, id_b, jaccard) with id_a < id_b,
    jaccard >= threshold."""
    banded = _banded(df, content_col, id_col, n)
    # cap pathological buckets (boilerplate clusters) — scale guard
    sized = banded.withColumn(
        "bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band", "band_key")))
    banded = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, ["band", "band_key"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())

    shingle_sets = (_with_shingle_hashes(df, content_col, n)
                    .select(F.col(id_col).alias("id"),
                            F.array_sort(F.col("__hashes")).alias("hset")))
    joined = (cand
              .join(shingle_sets.withColumnsRenamed(
                  {"id": "id_a", "hset": "hset_a"}), "id_a")
              .join(shingle_sets.withColumnsRenamed(
                  {"id": "id_b", "hset": "hset_b"}), "id_b"))
    inter = F.size(F.array_intersect("hset_a", "hset_b"))
    union = F.size(F.array_union("hset_a", "hset_b"))
    return (joined
            .withColumn("jaccard", inter.cast("double") / union.cast("double"))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def simhash_signatures(df: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """Per-doc SimHash over token hashes (word-level, 32-bit): bit b is set
    iff the signed sum of token-hash bit b over all tokens is >= 0.
    Output: (id, simhash)."""
    d = (df.withColumn("__toks", H.tokens_expr(F.col(content_col)))
         .withColumn("__hashes",
                     F.transform(F.col("__toks"), H.token_hash)))
    bit_terms = []
    for b in range(bits):
        w = 1 << b
        bit_terms.append(
            f"(CASE WHEN aggregate(__hashes, 0L, (acc, h) -> acc + "
            f"(CASE WHEN (h div {w}) % 2 = 1 THEN 1 ELSE -1 END)) >= 0 "
            f"THEN {w}L ELSE 0L END)")
    sim = F.expr(" + ".join(bit_terms))
    return d.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def simhash_near_pairs(df: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on half-signature
    bands (a pair within distance d <= 3 shares at least one of 4 8-bit
    bands unchanged — pigeonhole) to avoid the all-pairs join."""
    sig = simhash_signatures(df, content_col, id_col)
    bands = []
    for b in range(4):
        bands.append(F.struct(
            F.lit(b).alias("band"),
            ((F.col("simhash") / F.lit(1 << (8 * b))).cast("bigint")
             % F.lit(256)).alias("band_key")))
    banded = (sig.select("id", "simhash", F.explode(F.array(*bands)).alias("s"))
              .select("id", "simhash", "s.band", "s.band_key"))
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (a.join(b_, ["band", "band_key"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("a.simhash").alias("sim_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("b.simhash").alias("sim_b"))
            .distinct())
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.withColumn("hamming", ham.cast("int"))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, content_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.3) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (the non-probabilistic baseline
    for MinHash): explode shingle hashes, count shared shingles per pair in
    one groupBy, derive jaccard = shared / (|A| + |B| - shared)."""
    d = (_with_shingle_hashes(df, content_col, n)
         .select(F.col(id_col).alias("id"), F.col("__hashes").alias("h")))
    sizes = d.select("id", F.size("h").alias("sz"))
    expl = d.select("id", F.explode("h").alias("sh"))
    a, b = expl.alias("a"), expl.alias("b")
    shared = (a.join(b, "sh")
              .where(F.col("a.id") < F.col("b.id"))
              .groupBy(F.col("a.id").alias("id_a"),
                       F.col("b.id").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("shared")))
    out = (shared
           .join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
           .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
           .withColumn("jaccard",
                       F.col("shared").cast("double")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("shared"))
                       .cast("double"))
           .where(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return out


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos >= threshold).

    Brute-force all-pairs — correct baseline; the LSH-bucketed variant in
    operators/similarity.py is the 100 TB path."""
    from flink_descriptive_stats_spark.operators.similarity import (
        with_norm, cosine_expr)
    d = with_norm(df, id_col, vec_col)
    a, b = d.alias("a"), d.alias("b")
    pairs = (a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     cosine_expr("a", "b").alias("cos")))
    return pairs.where(F.col("cos") >= threshold)
