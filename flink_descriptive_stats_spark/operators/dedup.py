"""Deduplication operators for large-scale (training-data) pipelines.

Six dedup granularities, all Spark-first and (except where noted) verifiable
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
- repeated spans (r11): SUB-document, CROSS-document — the exact-
               substring stage after doc-level dedup (boilerplate
               headers/footers): mine document-frequency-qualified word
               n-grams (remove_repeated_spans / boilerplate_ngrams /
               span_removal_stats), or apply a frozen phrase list
               map-only at scan speed (remove_listed_spans — also under
               Structured Streaming).

Scale notes: signatures/bands are O(rows); the only quadratic step is within
LSH buckets (by construction small). Skewed buckets (e.g. empty-text
boilerplate) would hot-spot the band join — mitigated by capping bucket
width (drop buckets with > max_bucket docs, configurable; dropped buckets
are boilerplate clusters that get exact-dedup'd by the md5 path anyway).

Physical layout: shingling runs long-format (one row per doc×shingle) via
posexplode + windowed lead — whole-stage-codegen'd, measured 9x faster than
the equivalent interpreted higher-order-function array pipeline — and MinHash
signatures are then plain groupBy(id).agg(min(...) x k): map-side partial
aggregation, no per-row arrays, the shape that scales to 100 TB.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
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


def shingle_hashes_long(df: DataFrame, content_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        distinct: bool = True) -> DataFrame:
    """(id, sh) — one row per n-token shingle per document, with
    sh = md5-derived shingle hash mod p (functions/hashing.py).

    Built codegen-first: explode an index sequence and index the token array
    directly (element_at) — scan-local, zero shuffles, every stage
    whole-stage-codegen'd. The interpreted alternative (higher-order
    transform over a token array) measured 9x slower at sf0.1, and a
    posexplode + windowed-lead variant pays a needless window shuffle.
    Texts with < n tokens contribute one whole-text shingle (including ""
    for zero-token texts), matching the oracle definition in
    oracle_pipeline.py.

    distinct=True dedups shingles within a document (one shuffle on the
    skew-free (id, shingle) key) — required for set-semantics consumers
    (Jaccard). Min-aggregating consumers (MinHash) pass distinct=False:
    min over the multiset equals min over the set, so they stay
    shuffle-free up to their own groupBy.

    NULL-content rows are excluded (mirrored by the oracle's tokens CTE):
    a NULL document has no content to dedup by.
    """
    # NO adaptive spread here (measured, optimization r13): unlike the
    # span family, every consumer of this frame immediately shuffles
    # (DF groupBys, distinct, min-aggregates), so the tokenize+hash
    # work is light relative to an extra exchange — spreading measured
    # minhash_calibration 2.28->3.10s, containment 2.25->2.56s
    toks = df.where(F.col(content_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        H.tokens_expr(F.col(content_col)).alias("tk"))
    idx = F.explode(F.sequence(F.lit(0),
                               F.greatest(F.size("tk") - n, F.lit(0))))
    d = toks.select("id", "tk", idx.alias("i"))
    full = F.concat_ws(
        " ", *[F.element_at("tk", F.col("i") + j + 1) for j in range(n)])
    shingle = F.when(F.size("tk") >= n, full).otherwise(F.concat_ws(" ", "tk"))
    out = d.select("id", shingle.alias("s"))
    if distinct:
        out = out.distinct()
    return out.select("id", F.pmod(H.token_hash(F.col("s")),
                                   F.lit(H.MERSENNE_P)).alias("sh"))


def decontaminate(train: DataFrame, holdout: DataFrame,
                  content_col: str = "text", id_col: str = "doc_id",
                  fuzzy: bool = False, n: int = 3) -> DataFrame:
    """Remove from ``train`` every document whose content appears in
    ``holdout`` (eval-set decontamination).

    exact (default): anti-join on content md5 — one shuffle keyed by the
    hash (or a broadcast of the holdout hashes when the holdout is small,
    which AQE picks automatically; eval sets usually are).

    fuzzy=True: anti-join on MinHash LSH band keys — drops any train doc
    sharing a band bucket with a holdout doc. Band collision at the default
    parameters (4 bands x 4 rows) fires with probability ~j^4 per band for
    Jaccard j, so this over-removes aggressive near-duplicates — the right
    bias for decontamination (prefer losing a training doc to leaking an
    eval doc)."""
    if not fuzzy:
        key = F.md5(F.col(content_col)).alias("__k")
        return (train.withColumn("__k", key)
                .join(holdout.select(key).distinct(), "__k", "anti")
                .drop("__k"))
    hb = (_banded(holdout, content_col, id_col, n)
          .select("band", "band_key").distinct())
    contaminated = (_banded(train, content_col, id_col, n)
                    .join(hb, ["band", "band_key"], "semi")
                    .select(F.col("id").alias(id_col)).distinct())
    return train.join(contaminated, id_col, "anti")


def _splitmix_probe(x: "np.ndarray", i: int) -> "np.ndarray":
    """splitmix64 finalizer over (h + i*GOLD): k independent probe
    streams from one stored 64-bit hash (uint64 wraps are the intended
    modular arithmetic). Shared by the Bloom build and probe sides —
    both must derive identical positions."""
    GOLD = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        z = x + np.uint64(i) * GOLD
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bloom_set_words(h: DataFrame, m_bits: int, n_probes: int) -> DataFrame:
    """The distributed half of the Bloom build: per Arrow batch of
    distinct holdout hashes, compute every probe position and emit the
    batch's SET WORDS as (w = word index, b = 64-bit word) rows —
    sort + reduceat ORs within the batch, so rows emitted per batch are
    bounded by the batch's distinct touched words. One bounded
    groupBy(w).bit_or merges the partials; the result frame has at most
    m_bits/64 rows regardless of holdout size (signed int64 view: the
    OR of the signed representation ORs the same bits)."""
    import pandas as pd
    from typing import Iterator

    def words(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
            pos = np.concatenate([
                _splitmix_probe(x, i) % np.uint64(m_bits)
                for i in range(n_probes)])
            w = (pos // np.uint64(64)).astype(np.int64)
            bit = np.uint64(1) << (pos % np.uint64(64))
            order = np.argsort(w, kind="stable")
            ws, starts = np.unique(w[order], return_index=True)
            ors = np.bitwise_or.reduceat(bit[order], starts)
            yield pd.DataFrame({"w": ws, "b": ors.view(np.int64)})

    return (h.mapInPandas(words, "w bigint, b bigint")
            .groupBy("w").agg(F.bit_or("b").alias("b")))


def _bloom_bitset(h: DataFrame, bits_per_item: int,
                  n_probes: int) -> tuple["np.ndarray", int]:
    """Assemble the numpy bitset from the distributed set-words frame:
    one count sizes it (the bitset width must be known before probe
    positions can be computed), one Arrow toPandas collect of <=
    m_bits/64 (w, b) rows fills it — driver peak is bitset-scale
    (~2x the final 8 bytes/word), never holdout-scale. The distinct
    hash frame is persisted across the two jobs so the holdout's
    distinct shuffle runs once, not twice (a ~constant extra job vs
    the old driver-collect build is the price of bounded driver
    memory; reusing the materialization keeps it to one pass)."""
    h = h.persist()
    try:
        n_items = h.count()
        m_bits = max(64, bits_per_item * max(1, n_items))
        m_bits = ((m_bits + 63) // 64) * 64
        bloom = np.zeros(m_bits // 64, dtype=np.uint64)
        if n_items:
            wpdf = _bloom_set_words(h, m_bits, n_probes).toPandas()
            bloom[wpdf["w"].to_numpy(dtype=np.int64)] = \
                wpdf["b"].to_numpy(dtype=np.int64).view(np.uint64)
    finally:
        h.unpersist()
    return bloom, m_bits


def decontaminate_bloom(train: DataFrame, holdout: DataFrame,
                        content_col: str = "text",
                        id_col: str = "doc_id",
                        bits_per_item: int = 16,
                        n_probes: int = 8) -> DataFrame:
    """Exact decontamination with a BLOOM-FILTER prefilter — the 100 TB
    route for the middle regime where the holdout's hash set is too big
    to broadcast-anti-join (AQE stops helping past the broadcast
    threshold) but its Bloom bitset still fits everywhere: ~2 bytes per
    holdout doc at the defaults vs 16+ for the hash set itself.

    Shape: the bitset is built DISTRIBUTED — one bounded count of the
    holdout's distinct xxhash64 values sizes it, then an Arrow
    mapInPandas pass emits each batch's SET WORDS as (word_index,
    word_bits) partials and one groupBy(word_index).bit_or aggregate
    OR-merges them, so what reaches the driver is the words frame
    (<= m_bits/64 rows ~ 16 bytes per 8-byte bitset word via the Arrow
    collect — bitset-scale, never the 8 B/doc of raw hashes the first
    version collected, a 4x driver-peak cut at exactly the holdout
    scale this operator exists for). The assembled numpy bitset is
    SHARED via a Spark broadcast variable, then a vectorized Arrow
    flagging pass runs over the corpus scan. Bloom-NEGATIVE rows are
    definitely clean (no false negatives) and flow straight through;
    only the bloom-POSITIVE sliver (true matches + ~0.06% false
    positives at 16 bits/item, 8 probes) pays the exact md5 anti-join —
    so the shuffle the plain exact path runs over the WHOLE corpus
    shrinks to the sliver. The final result is EXACT (the anti-join
    recheck kills every false positive), so this query gates against
    the SAME oracle as decontaminate(fuzzy=False); equality is also
    pytest-pinned, including at a deliberately undersized filter, and
    the distributed bitset is pinned bit-identical to a driver-built
    one.

    The two output branches each re-run the cheap narrow flag pass
    rather than caching it — at scale two narrow scans beat
    materializing the corpus. NULL-content rows are kept, matching the
    exact path (md5(NULL) joins nothing)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    h = (holdout.where(F.col(content_col).isNotNull())
         .select(F.xxhash64(F.col(content_col)).alias("h"))
         .distinct())
    bloom, m_bits = _bloom_bitset(h, bits_per_item, n_probes)
    bc = train.sparkSession.sparkContext.broadcast(bloom)
    mb = m_bits
    _mix = _splitmix_probe

    @pandas_udf("boolean")
    def bloom_hit(h: pd.Series) -> pd.Series:
        arr = bc.value
        x = h.to_numpy(dtype=np.int64).astype(np.uint64)
        acc = np.ones(len(x), dtype=bool)
        for i in range(n_probes):
            pos = _mix(x, i) % np.uint64(mb)
            word = arr[(pos // np.uint64(64)).astype(np.int64)]
            acc &= ((word >> (pos % np.uint64(64)))
                    & np.uint64(1)).astype(bool)
        return pd.Series(acc)

    d = train.withColumn(
        "__hit", F.col(content_col).isNotNull()
        & bloom_hit(F.xxhash64(F.col(content_col))))
    clean = d.where(~F.col("__hit"))
    key = F.md5(F.col(content_col)).alias("__k")
    sus = (d.where(F.col("__hit")).withColumn("__k", key)
           .join(holdout.select(key).distinct(), "__k", "anti")
           .drop("__k"))
    return clean.unionByName(sus).drop("__hit")


def keep_first(df: DataFrame, content_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: keep the lowest-id row per exact content
    group, preserving every input column. One shuffle, keyed by content md5
    (high-cardinality; a boilerplate mega-group only concentrates its own
    copies, and row_number within a group is a linear scan)."""
    w = Window.partitionBy(F.md5(F.col(content_col))).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def _minhash_wide(df: DataFrame, content_col: str, id_col: str,
                  n: int = 3) -> DataFrame:
    """(id, sig_0..sig_{k-1}) — MinHash signatures as k min() aggregates over
    the long shingle-hash format: map-side partial aggregation, no arrays,
    one shuffle total (the 1-row-per-doc groupBy)."""
    long = shingle_hashes_long(df, content_col, id_col, n, distinct=False)
    aggs = [
        F.min((F.col("sh") * F.lit(a) + F.lit(b)) % F.lit(H.MERSENNE_P)
              ).alias(f"sig_{j}")
        for j, (a, b) in enumerate(H.MINHASH_PARAMS)]
    return long.groupBy("id").agg(*aggs)


def minhash_signatures(df: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """MinHash signatures, long format: (id, sig_idx, sig_val).

    k=16 permutations over md5-derived shingle hashes (see
    functions/hashing.py for the exact arithmetic, shared with the oracle).
    Plan: shingle long-format -> groupBy(id).agg(16 mins) -> explode."""
    wide = _minhash_wide(df, content_col, id_col, n)
    structs = F.array(*[
        F.struct(F.lit(j).alias("sig_idx"), F.col(f"sig_{j}").alias("sig_val"))
        for j in range(H.MINHASH_K)])
    return (wide.select("id", F.explode(structs).alias("s"))
            .select("id", "s.sig_idx", "s.sig_val"))


def _banded(df: DataFrame, content_col: str, id_col: str,
            n: int = 3) -> DataFrame:
    """(id, band, band_key) — one row per LSH band."""
    wide = _minhash_wide(df, content_col, id_col, n)
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
    # ONE groupBy(id) computes the 16 MinHash mins AND the sorted
    # distinct shingle set (r14): the r13 shape exploded the shingles
    # twice — once for _minhash_wide (distinct=False) and once for the
    # verification sets (distinct long + collect_list) — paying the
    # tokenize+hash explode and an extra (id, sh) dedup shuffle twice.
    # min over the multiset equals min over the set, and
    # array_sort(collect_set) equals array_sort(collect_list over the
    # deduped long), so the fused aggregate is value-identical
    # (A/B-verified row-for-row; same-harness min-of-3 per round:
    # 3.12/1.99/1.78 -> 2.59/1.53/1.72s). Persisting the fused frame
    # measured SLOWER (4.05/1.95/1.84) — exchange reuse already shares
    # the one shuffle; the cache materialization is pure cost.
    long = shingle_hashes_long(df, content_col, id_col, n, distinct=False)
    aggs = [
        F.min((F.col("sh") * F.lit(a) + F.lit(b)) % F.lit(H.MERSENNE_P)
              ).alias(f"sig_{j}")
        for j, (a, b) in enumerate(H.MINHASH_PARAMS)]
    aggs.append(F.array_sort(F.collect_set("sh")).alias("hset"))
    wide = long.groupBy("id").agg(*aggs)
    bands = []
    for b in range(H.LSH_BANDS):
        key = F.concat_ws(
            ",", *[F.col(f"sig_{b * H.LSH_ROWS + r}").cast("string")
                   for r in range(H.LSH_ROWS)])
        bands.append(F.struct(F.lit(b).alias("band"), key.alias("band_key")))
    banded = (wide.select("id", F.explode(F.array(*bands)).alias("s"))
              .select("id", "s.band", "s.band_key"))
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

    shingle_sets = wide.select("id", "hset")
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
    Output: (id, simhash). NULL-content rows are excluded (mirrored by the
    oracle's tokens CTE); a doc with ZERO tokens has every per-bit sum 0,
    so all bits set (2^bits - 1) — preserved here by explode_outer's NULL
    row contributing 0 to every sum.

    Physical plan: explode tokens long-format, then ONE groupBy(id) with
    ``bits`` conditional sums — map-side partial aggregation inside
    whole-stage codegen. Replaces the previous 32 interpreted higher-order
    ``aggregate`` folds per row (this file's measured finding: interpreted
    HOF is ~9x slower than the codegen'd long format; bench confirmed
    11.9s -> long-format territory)."""
    long = (df.where(F.col(content_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.explode_outer(H.tokens_expr(F.col(content_col)))
                    .alias("__tok"))
            .select("id", H.token_hash(F.col("__tok")).alias("h")))
    aggs = []
    for b in range(bits):
        bit_set = F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1
        signed = (F.when(F.col("h").isNull(), 0)
                  .when(bit_set, 1).otherwise(-1))
        aggs.append(F.sum(signed).alias(f"__s{b}"))
    agg = long.groupBy("id").agg(*aggs)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"__s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("id", sim.cast("bigint").alias("simhash"))


def simhash_near_pairs(df: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on half-signature
    bands (a pair within distance d <= 3 shares at least one of 4 8-bit
    bands unchanged — pigeonhole) to avoid the all-pairs join. The 4-band
    blocking is exhaustive ONLY for max_hamming <= 3; larger radii would
    silently miss pairs, so they are rejected."""
    if max_hamming > 3:
        raise ValueError(
            "4-band blocking is exhaustive only for max_hamming <= 3; "
            "use more/narrower bands for a larger radius")
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


def _shared_shingle_counts(df: DataFrame, content_col: str, id_col: str,
                           n: int, max_df: int | None):
    """(shared, sizes): per-pair shared-shingle counts and per-doc distinct
    shingle counts — the common subplan of ngram_jaccard_pairs and
    ngram_containment_pairs. Pairs are generated inline per shingle group
    (JVM nested transform, no self-join); ``max_df`` drops stopword-grams
    whose doc frequency exceeds it BEFORE the k(k-1)/2 pair explosion."""
    # NOT persisted (r14 revert of the r13 build-session _persist_pos):
    # the r13 A/B (2.12 -> ~2.0s) was band-confounded, and the driver's
    # r13 bench showed jaccard_pairs regressing 1.57 -> 2.35s (+50%, the
    # round's one real regression). A clean same-harness min-of-3 x2 A/B
    # at sf0.1 (r14): WITH persist jaccard 1.80-2.07s / containment
    # 1.65-2.07s, WITHOUT 1.58-1.89s / 1.59-1.81s — the materialization
    # job costs more than the two groupBy consumers repay here (both
    # consumers shuffle immediately, so the recompute is one extra
    # narrow scan, not a repeated explode tree per round).
    long = shingle_hashes_long(df, content_col, id_col, n)
    sizes = long.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    grouped = (long.groupBy("sh")
               .agg(F.array_sort(F.collect_list("id")).alias("ids"))
               .where(F.size("ids") > 1))
    if max_df is not None:
        grouped = grouped.where(F.size("ids") <= max_df)
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> transform("
        "slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS id_a, y AS id_b))))")
    shared = (grouped.select(F.explode(pair_expr).alias("p"))
              .select("p.id_a", "p.id_b")
              .where(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).alias("shared")))
    # no broadcast hint on sizes: one row per doc, so only AQE should decide
    # (it will broadcast at bench scale, shuffle-join at 100 TB)
    return (shared
            .join(sizes.withColumnsRenamed(
                {"id": "id_a", "sz": "sz_a"}), "id_a")
            .join(sizes.withColumnsRenamed(
                {"id": "id_b", "sz": "sz_b"}), "id_b"))


def ngram_jaccard_pairs(df: DataFrame, content_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.3,
                        max_df: int | None = None) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (the non-probabilistic baseline
    for MinHash): group docs per shingle, emit co-occurring pairs inline
    (JVM-side nested transform — no self-join), count shared shingles per
    pair, derive jaccard = shared / (|A| + |B| - shared).

    Scale: one shuffle keyed by shingle + one keyed by (id_a, id_b); vs the
    naive explode self-join this halves the shuffled volume (measured 1.5x
    at sf0.1). Inherently quadratic in per-shingle doc frequency:
    ``max_df`` drops stopword-grams (doc frequency > max_df) BEFORE the
    pair explosion, bounding per-shingle fan-out to max_df^2 — set it at
    100 TB (a shingle shared by k docs emits k(k-1)/2 pairs; a boilerplate
    shingle in 1M docs would emit 5e11). Dropping only ubiquitous shingles
    biases jaccard DOWN for pairs that shared them (denominator keeps both
    docs' full sizes), so it under-merges — the safe direction for dedup.
    Default None = exact (doc freq is bounded at bench scale: max 25 at
    sf0.1)."""
    return (_shared_shingle_counts(df, content_col, id_col, n, max_df)
            .withColumn("jaccard",
                        F.col("shared").cast("double")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("shared"))
                        .cast("double"))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def ngram_containment_pairs(df: DataFrame, content_col: str = "text",
                            id_col: str = "doc_id", n: int = 3,
                            threshold: float = 0.5,
                            max_df: int | None = None) -> DataFrame:
    """Asymmetric n-gram containment pairs: c(A in B) = |A∩B| / |A| — the
    quote/subset detector Jaccard misses (a short doc fully contained in a
    long one has high containment but low Jaccard; Broder's original
    resemblance/containment pair). Emits (id_a, id_b, containment_a,
    containment_b, jaccard) for pairs where EITHER direction reaches the
    threshold.

    Same physical shape as ngram_jaccard_pairs (shared subplan
    ``_shared_shingle_counts`` — one shuffle keyed by shingle, one by pair;
    ``max_df`` bounds per-shingle fan-out), so the 100 TB notes there apply
    unchanged."""
    sh_d = F.col("shared").cast("double")
    return (_shared_shingle_counts(df, content_col, id_col, n, max_df)
            .withColumn("containment_a", sh_d / F.col("sz_a"))
            .withColumn("containment_b", sh_d / F.col("sz_b"))
            .withColumn("jaccard",
                        sh_d / (F.col("sz_a") + F.col("sz_b")
                                - F.col("shared")).cast("double"))
            .where((F.col("containment_a") >= threshold)
                   | (F.col("containment_b") >= threshold))
            .select("id_a", "id_b", "containment_a", "containment_b",
                    "jaccard"))


def duplicated_ngram_fraction(df: DataFrame, content_col: str = "text",
                              id_col: str = "doc_id",
                              n: int = 3) -> DataFrame:
    """Per-document cross-corpus duplicated-text measure: the fraction of a
    doc's distinct n-gram shingles that appear in at least one OTHER doc —
    the scalable groupBy proxy for suffix-array substring dedup (Lee et al.
    2021): docs with high duplicated fraction are copies, templates, or
    heavy quoters even when no single pair crosses a Jaccard threshold.

    Output: (doc_id, n_shingles, dup_fraction). Plan: distinct (id,
    shingle-hash) long format -> ONE groupBy(shingle) doc-frequency count
    (map-side combined, bounded keys) -> join back on shingle -> per-doc
    mean of the df>1 flag. Shuffles are keyed by shingle and id — both
    skew-capped by construction (a shingle's row count is its doc
    frequency, a doc's row count its shingle count)."""
    long = (shingle_hashes_long(df, content_col, id_col, n)
            .select("id", "sh").distinct())
    # consumed twice (docfreq + the join back) — persist the narrow
    # (id, sh) ints (r13 span-persist lesson)
    long = _persist_pos(long)
    # (id, sh) is distinct above, so plain count == distinct doc count
    # without the expand/distinct aggregation state
    docfreq = long.groupBy("sh").agg(
        F.count(F.lit(1)).alias("df_docs"))
    return (long.join(docfreq, "sh")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.avg((F.col("df_docs") > 1).cast("double"))
                 .alias("dup_fraction"))
            .select(F.col("id").alias(id_col), "n_shingles",
                    "dup_fraction"))


def contamination_report(train: DataFrame, holdout: DataFrame,
                         content_col: str = "text",
                         id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Per-holdout-doc n-gram overlap against the training corpus — the
    GPT-3-appendix-style contamination MEASUREMENT next to the binary
    ``decontaminate`` filter: (doc_id, n_shingles, matched_fraction) where
    matched_fraction is the share of the holdout doc's distinct shingles
    that occur anywhere in train. Rank by it to audit what leaked before
    deciding a removal threshold.

    Plan: both sides go through the same distinct (id, shingle-hash) long
    format; train collapses to a distinct shingle SET (one groupBy,
    map-side combined), and the holdout side LEFT-joins it (AQE broadcasts
    when the train shingle set is small enough, shuffle-hash otherwise,
    keyed by shingle — skew-free). One row per holdout doc comes back."""
    h_long = (shingle_hashes_long(holdout, content_col, id_col, n)
              .select("id", "sh").distinct())
    t_sh = (shingle_hashes_long(train, content_col, id_col, n)
            .select("sh").distinct()
            .withColumn("__hit", F.lit(1)))
    return (h_long.join(t_sh, "sh", "left")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.avg(F.coalesce(F.col("__hit"), F.lit(0))
                       .cast("double")).alias("matched_fraction"))
            .select(F.col("id").alias(id_col), "n_shingles",
                    "matched_fraction"))


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95,
                             num_blocks: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos >= threshold).

    Exact all-pairs semantics, two-phase physical plan — fully distributed,
    nothing ever collected to the driver:

    1. Block-sharded BLAS prefilter — rows are hashed into B id-blocks,
       each block packed into one (blk, rows) record; a tiny driver-built
       (blk_a, blk_b) index (B(B+1)/2 int pairs — metadata, not data) is
       equi-joined against the packed blocks, and each block-pair task runs
       one float64 GEMM over its two sub-matrices (mapInPandas), keeping
       pairs with cos >= threshold - 1e-9. Every unordered id pair lands in
       exactly one block-pair task, so no distinct is needed.
    2. Exact re-check — survivors get the index-order left-fold dot product
       (same JVM expression as the oracle), so emitted cos values stay
       bit-identical to DuckDB while the O(n^2) flops run in BLAS.

    Scale: per-block memory is bounded (~64 MB of float64 by default; B is
    derived from a count when not given), tasks are B(B+1)/2-parallel, and
    shuffle volume is ~(B+1)/2 copies of the corpus — the inherent
    replication cost of exact all-pairs. For corpora where even that is too
    much, the sub-quadratic route is an LSH-bucket prefilter
    (operators/similarity.lsh_topk buckets) instead of the dense GEMM;
    exact all-pairs at 100 TB is the wrong ask regardless of engine."""
    from flink_descriptive_stats_spark.operators.similarity import with_norm
    spark = df.sparkSession
    d = with_norm(df, id_col, vec_col)
    if num_blocks is None:
        # ONE memoized job (VERDICT r11 #2: this used to be a count()
        # PLUS a first() — two full scans per call on num_blocks=None,
        # wasted again on every repeat call over the same input)
        from flink_descriptive_stats_spark.functions.memo import \
            agg_row_memoized
        row = agg_row_memoized(
            d, [F.count(F.lit(1)).alias("n"),
                F.max(F.size("v")).alias("dim")],
            ("embedding_near_dup_blocks",))
        n = int(row["n"])
        dim = int(row["dim"]) if row["dim"] is not None else 1
        # ~64 MB of float64 per block, at least 4 blocks so the
        # B(B+1)/2 block-pair tasks spread across executors
        num_blocks = max(4, -(-(n * dim * 8) // (64 << 20)))
    nb = int(num_blocks)
    packed = (d.withColumn("blk", F.pmod(F.col("id"), F.lit(nb)).cast("int"))
              .groupBy("blk")
              .agg(F.collect_list(F.struct("id", "v", "norm")).alias("rows")))
    pair_idx = spark.createDataFrame(
        [(i, j) for i in range(nb) for j in range(i, nb)],
        "blk_a int, blk_b int")
    pairs = (F.broadcast(pair_idx)
             .join(packed.select(F.col("blk").alias("blk_a"),
                                 F.col("rows").alias("rows_a")), "blk_a")
             .join(packed.select(F.col("blk").alias("blk_b"),
                                 F.col("rows").alias("rows_b")), "blk_b"))
    eps = 1e-9

    def gen(batches):
        for pdf in batches:
            for blk_a, blk_b, rows_a, rows_b in zip(
                    pdf["blk_a"], pdf["blk_b"], pdf["rows_a"], pdf["rows_b"]):
                ia = np.array([r["id"] for r in rows_a], dtype=np.int64)
                ib = np.array([r["id"] for r in rows_b], dtype=np.int64)
                ma = np.array([r["v"] for r in rows_a], dtype=np.float64)
                mb = np.array([r["v"] for r in rows_b], dtype=np.float64)
                ma /= np.array([r["norm"] for r in rows_a],
                               dtype=np.float64)[:, None]
                mb /= np.array([r["norm"] for r in rows_b],
                               dtype=np.float64)[:, None]
                cos = ma @ mb.T
                x, y = np.nonzero(cos >= threshold - eps)
                qa, qb = ia[x], ib[y]
                if blk_a == blk_b:
                    # both orders present in the square block — keep one
                    keep = qa < qb
                    qa, qb = qa[keep], qb[keep]
                else:
                    # cross-block hit appears once; order the ids
                    qa, qb = np.minimum(qa, qb), np.maximum(qa, qb)
                yield pd.DataFrame({"id_a": qa, "id_b": qb})

    cand = pairs.mapInPandas(gen, "id_a bigint, id_b bigint")
    return _exact_cos_recheck(d, cand, threshold)


def _exact_cos_recheck(d: DataFrame, cand: DataFrame,
                       threshold: float) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to their vectors and keep
    those with exact index-order left-fold cosine >= threshold (the same
    JVM expression the oracle uses, so values are bit-identical)."""
    a = d.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                 F.col("norm").alias("na"))
    b = d.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("norm").alias("nb"))
    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, z: acc + z)
    return (cand.join(a, "id_a").join(b, "id_b")
            .withColumn("cos", dot / (F.col("na") * F.col("nb")))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))


def embedding_near_dup_pairs_lsh(df: DataFrame, id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 threshold: float = 0.95,
                                 n_tables: int = 8, bits_per_table: int = 8,
                                 dim: int = 64,
                                 max_bucket: int | None = 65536) -> DataFrame:
    """Sub-quadratic embedding near-dup: banded hyperplane-LSH candidate
    generation + exact cosine recheck — the scale path next to the exact
    block-GEMM ``embedding_near_dup_pairs``.

    Candidates are pairs colliding in ANY of L tables of b sign-bits
    (probability 1-(1-p^b)^L for a pair with bit-agreement p = 1-theta/pi),
    so recall < 1 by design — the standard LSH trade. Defaults (8x8) fit
    the realistic regime (threshold ~0.95 -> ~99% recall touching ~3% of
    pairs); LOW thresholds on near-isotropic data need wider/looser tables
    (the 0.45-threshold fixture gate uses 16x4 -> 13/14 pairs) because
    near-random pairs simply don't concentrate in buckets.

    Physical shape at 100 TB: vectors shuffle ONCE keyed by (table,
    bucket); each bucket is one BLAS GEMM task (mapInPandas) that emits
    only its pairs above threshold — the same vectorized kernel as the
    exact block-GEMM operator, but over LSH buckets instead of all block
    pairs, so total flops ~= sum of bucket sizes squared, not n^2. The
    tiny surviving pair set is DISTINCT'ed (cross-table dupes) and
    re-checked with the exact JVM left-fold cosine so emitted values stay
    bit-identical to the oracle. (A pure-JVM variant — id-only bucket
    self-join + per-pair higher-order-function cosine — measured 8.6s vs
    ~2s at sf0.1: interpreted HOF folds over millions of candidate pairs
    lose to Arrow-batched BLAS by far.) ``max_bucket`` drops degenerate
    buckets (dead-center vectors) the same way the MinHash band join caps
    boilerplate clusters, and bounds per-task memory. The default (65536
    vectors ~ 32 MB of float64 at dim=64, a comfortable single-task GEMM)
    is finite on purpose: with few buckets (small bits_per_table) one
    bucket's collect_list plus its O(bucket^2) GEMM would otherwise grow
    with corpus size in a single task. Dropping loses that bucket's pairs
    — when recall over dense clusters matters, raise bits_per_table so
    buckets subdivide (or salt-split the bucket and accept intra-split
    recall only) instead of raising max_bucket unboundedly; exact md5
    dedup upstream already removes the identical-text mass that creates
    degenerate buckets."""
    from flink_descriptive_stats_spark.operators.similarity import (
        lsh_table_codes, with_norm)
    d = with_norm(df, id_col, vec_col)
    coded = d.withColumn(
        "codes", lsh_table_codes("v", n_tables, bits_per_table, dim))
    dl = coded.select("id", "v", "norm",
                      F.posexplode("codes").alias("tbl", "bucket"))
    packed = (dl.groupBy("tbl", "bucket")
              .agg(F.collect_list(F.struct("id", "v", "norm"))
                   .alias("rows"))
              .where(F.size("rows") > 1))
    if max_bucket is not None:
        packed = packed.where(F.size("rows") <= max_bucket)
    eps = 1e-9

    def gen(batches):
        for pdf in batches:
            for rows in pdf["rows"]:
                ids = np.array([r["id"] for r in rows], dtype=np.int64)
                m = np.array([r["v"] for r in rows], dtype=np.float64)
                m /= np.array([r["norm"] for r in rows],
                              dtype=np.float64)[:, None]
                cos = m @ m.T
                # triu(k=1): each unordered row pair once, no diagonal
                x, y = np.nonzero(np.triu(cos >= threshold - eps, k=1))
                qa, qb = ids[x], ids[y]
                yield pd.DataFrame({"id_a": np.minimum(qa, qb),
                                    "id_b": np.maximum(qa, qb)})

    cand = (packed.mapInPandas(gen, "id_a bigint, id_b bigint")
            .distinct())
    return _exact_cos_recheck(d, cand, threshold)


# bounded per-process memo of cluster-label DataFrames (see
# neardup_clusters); values are localCheckpoint-materialized so reuse is a
# read of cached blocks, not a recomputation. Entries carry a session
# weakref so id()-address reuse by a NEW session can't serve stale labels.
_CLUSTER_MEMO: dict[tuple, tuple] = {}


def _cluster_memo_put(key: tuple, sess, out: DataFrame) -> None:
    import weakref
    if len(_CLUSTER_MEMO) >= 32:
        _CLUSTER_MEMO.pop(next(iter(_CLUSTER_MEMO)))
    _CLUSTER_MEMO[key] = (weakref.ref(sess), out)


def _cluster_memo_get(key: tuple, sess) -> DataFrame | None:
    hit = _CLUSTER_MEMO.get(key)
    if hit is None:
        return None
    ref, out = hit
    if ref() is sess:
        return out
    del _CLUSTER_MEMO[key]
    return None


def _edge_signature(edges: DataFrame) -> tuple:
    """Cheap fixpoint signature of a DISTINCT edge set: (count, xor of
    xxhash64) — xor cannot overflow and is order-independent."""
    r = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h")).collect()[0]
    return (r["n"], r["h"])


def connected_components_star(edges: DataFrame, nodes: DataFrame,
                              max_iter: int = 25) -> DataFrame:
    """Connected components via large-star/small-star alternation (Kiveris
    et al., "Connected Components in MapReduce and Beyond") — O(log n)
    rounds regardless of component DIAMETER, vs min-label propagation's
    O(diameter) rounds. The extreme-scale path for chain-shaped components
    (propagation is fine for near-dup clusters, whose diameter is small).

    ``edges``: (u, v) pairs, any orientation. ``nodes``: (id) — every node
    that must appear in the output (singletons label themselves).
    Returns (id, cluster_id = component minimum).

    Each round is two groupBy(node) aggregations + joins on the edge list
    only — never on the corpus. Fixpoint detected by an (count, hash-sum)
    edge-set signature; ``max_iter`` (default 25 ~ log2 of anything) is the
    safety bound."""
    # LAZY checkpoint of the INCOMING edge list (r14): round 0's
    # signature action used to execute the whole upstream pair funnel
    # (LSH banding, self-join, exact verify) inside its own job tree,
    # where the star transformations reference `e` four times per round
    # — the checkpoint caches the funnel output at first materialization
    # so those self-references read partitions instead of re-deriving
    # the funnel subtree, and it truncates the analysis tree every
    # later round re-plans (measured over the five star consumers,
    # 2 rounds: 17.6-17.9s -> 13.5-15.4s). Same lineage trade the
    # per-round checkpoints below already accept.
    e = (edges.select(F.col("u").cast("bigint"), F.col("v").cast("bigint"))
         .where(F.col("u") != F.col("v"))).localCheckpoint(eager=False)
    sig = None
    for _ in range(max_iter):
        # large-star: every neighbor LARGER than u links to m(u) =
        # min(N(u) + {u})
        both = e.union(e.select(F.col("v").alias("u"),
                                F.col("u").alias("v")))
        mins = (both.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", "u").alias("m")))
        e = (both.join(mins, "u")
             .where(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .where(F.col("u") != F.col("v")).distinct())
        # small-star: canonicalize (u > v), link every smaller neighbor
        # (and u itself) to the minimum neighbor
        canon = (e.select(F.greatest("u", "v").alias("u"),
                          F.least("u", "v").alias("v")))
        mins = canon.groupBy("u").agg(F.min("v").alias("mn"))
        joined = canon.join(mins, "u")
        e = (joined.select(F.col("v").alias("u"), F.col("mn").alias("v"))
             .union(mins.select("u", F.col("mn").alias("v")))
             .where(F.col("u") != F.col("v")).distinct())
        # LAZY checkpoint: the signature aggregate right below is the
        # round's one action and materializes the checkpoint as it runs —
        # an eager checkpoint would cost a second job per round for the
        # same bytes (measured: the CC rounds dominate the media funnels'
        # job count)
        e = e.localCheckpoint(eager=False)
        new_sig = _edge_signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    # converged: every edge is (node, component-min)
    labels = e.groupBy("u").agg(F.min("v").alias("cluster_id"))
    return (nodes.select(F.col(nodes.columns[0]).alias("id"))
            .join(labels.withColumnRenamed("u", "id"), "id", "left")
            .select("id", F.coalesce("cluster_id", "id").alias("cluster_id")))


def neardup_clusters(df: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id", n: int = 3,
                     threshold: float = 0.5,
                     max_iter: int = 15,
                     method: str = "propagate") -> DataFrame:
    """(id, cluster_id) for every non-NULL-content doc: connected
    components of the MinHash near-dup pair graph, labeled by the smallest
    doc id in the component (singletons label themselves).

    Pairs alone aren't a dedup decision — transitively-linked docs (A~B,
    B~C) must land in ONE cluster even when A~C misses the threshold.
    Components come from iterative min-label propagation: each round every
    node takes the min label among itself and its neighbors; rounds needed
    = graph diameter, and near-dup components are small and dense (their
    diameter is a few hops), so the loop converges in a handful of rounds
    — checked by an exact fixpoint test per round, capped at ``max_iter``.
    Each round is one join + one groupBy(min) on the (tiny) edge list, not
    on the corpus. At extreme component sizes (long chains), pass
    method="star" for the large-star/small-star alternation
    (connected_components_star — O(log n) rounds regardless of diameter).
    """
    # label memo: the labels DataFrame is localCheckpoint-materialized, so
    # repeat clustering of the same input (dedup_corpus after
    # neardup_clusters, multiple consumers in one pipeline) returns the
    # already-computed labels instead of re-running pair generation + CC
    try:
        key = (id(df.sparkSession),
               df._jdf.queryExecution().analyzed().semanticHash(),
               (content_col, id_col, n, threshold, method))
    except Exception:
        key = None
    if key is not None:
        hit = _cluster_memo_get(key, df.sparkSession)
        if hit is not None:
            return hit

    pairs = minhash_dedup_pairs(df, content_col, id_col, n, threshold)
    if method == "star":
        nodes = (df.where(F.col(content_col).isNotNull())
                 .select(F.col(id_col).alias("id")))
        out = connected_components_star(
            pairs.select(F.col("id_a").alias("u"),
                         F.col("id_b").alias("v")), nodes).localCheckpoint()
        if key is not None:
            _cluster_memo_put(key, df.sparkSession, out)
        return out
    edges = (pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("t"))
             .union(pairs.select(F.col("id_b").alias("s"),
                                 F.col("id_a").alias("t"))))
    edges = edges.localCheckpoint()  # pair generation runs once, not per round
    labels = (df.where(F.col(content_col).isNotNull())
              .select(F.col(id_col).alias("id"))
              .withColumn("comp", F.col("id")))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        prop = (edges.join(labels, edges["s"] == labels["id"])
                .groupBy(F.col("t").alias("id"))
                .agg(F.min("comp").alias("ncomp")))
        merged = (labels.join(prop, "id", "left")
                  .select("id", F.least("comp", "ncomp").alias("comp"),
                          (F.col("ncomp") < F.col("comp")).alias("chg")))
        # lazy checkpoint: the change-count action materializes it — one
        # job per round instead of two (same trick as the star loop)
        merged = merged.localCheckpoint(eager=False)
        changed = merged.where("chg").count()
        labels = merged.drop("chg")
        if changed == 0:
            break
    out = labels.select("id", F.col("comp").alias("cluster_id"))
    if key is not None:
        _cluster_memo_put(key, df.sparkSession, out)
    return out


def dedup_corpus(df: DataFrame, content_col: str = "text",
                 id_col: str = "doc_id", n: int = 3,
                 threshold: float = 0.5) -> DataFrame:
    """The near-dup-deduplicated corpus: the lowest-id representative of
    each near-dup cluster (subsumes exact dedup — identical docs share all
    shingles, Jaccard 1). Semi-join of the corpus against cluster labels
    where id == cluster_id."""
    reps = (neardup_clusters(df, content_col, id_col, n, threshold)
            .where(F.col("id") == F.col("cluster_id"))
            .select(F.col("id").alias(id_col)))
    return df.join(reps, id_col, "semi")


def cluster_size_histogram(df: DataFrame, content_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           threshold: float = 0.5) -> DataFrame:
    """Distribution of near-dup cluster sizes: (cluster_size, n_clusters,
    n_docs) — the corpus-health summary a dedup pass reports (size 1 =
    unique docs; a fat tail of large clusters means boilerplate).

    Composition over the memoized ``neardup_clusters`` labels: one
    groupBy(cluster_id) count, then a grouped count over the bounded size
    domain — both aggregations over label rows, never the text."""
    labels = neardup_clusters(df, content_col, id_col, n, threshold)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (sizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters"))
            .withColumn("n_docs",
                        F.col("cluster_size") * F.col("n_clusters")))


def corpus_overlap(df_a: DataFrame, df_b: DataFrame,
                   content_col: str = "text", id_col: str = "doc_id",
                   n: int = 3) -> DataFrame:
    """Corpus-level content overlap BEFORE any pairwise dedup: one row
    (n_shingles_a, n_shingles_b, n_common, jaccard, containment_a_in_b)
    over the two corpora's DISTINCT n-gram shingle sets — the go/no-go
    estimate for cross-corpus dedup and the decontamination-risk number
    for a train/eval pair ("how much of A's content exists in B at
    all"), at set level rather than document level.

    Shape: each corpus collapses to its distinct shingle-hash set (one
    groupBy each, map-side combined — the same collapse decontaminate
    uses), one hash-keyed join for the intersection, three 1-row counts.
    Nothing pairwise, nothing quadratic; document payloads never move."""
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    sa = (shingle_hashes_long(df_a, content_col, id_col, n=n)
          .select("sh").distinct())
    sb = (shingle_hashes_long(df_b, content_col, id_col, n=n)
          .select("sh").distinct())
    na = int(sa.count())
    nb = int(sb.count())
    common = int(sa.join(sb, "sh").count())
    union = na + nb - common
    jac = common / union if union else None
    cont = common / na if na else None
    return df_a.sparkSession.createDataFrame(
        [(na, nb, common,
          sig6_py(jac) if jac is not None else None,
          sig6_py(cont) if cont is not None else None)],
        "n_shingles_a bigint, n_shingles_b bigint, n_common bigint, "
        "jaccard string, containment_a_in_b string")


def shared_prefix_groups(df: DataFrame, content_col: str = "text",
                         id_col: str = "doc_id", k_tokens: int = 2,
                         min_docs: int = 2) -> DataFrame:
    """Boilerplate-header detection: groups of documents sharing their
    first ``k_tokens`` tokens — the template/scraper signature that exact
    and near dedup both miss when bodies differ (mirror pages, form
    letters, licence headers). Output: (prefix, n_docs, example_id) with
    example_id = the smallest doc id in the group (a stable
    representative to inspect).

    One narrow prefix projection + one grouped count keyed by the
    prefix; only groups of ``min_docs``+ survive. Document bodies never
    shuffle — the prefix string (k tokens) is all that moves."""
    toks = H.tokens_expr(F.col(content_col))
    prefix = F.array_join(F.slice(toks, 1, k_tokens), " ")
    return (df.where(F.col(content_col).isNotNull())
            .select(prefix.alias("prefix"),
                    F.col(id_col).alias("id"))
            .where(F.length("prefix") > 0)
            .groupBy("prefix")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("id").alias("example_id"))
            .where(F.col("n_docs") >= min_docs))


def _canonical_expr(content_col: str) -> F.Column:
    """The canonical form used by canonical_dedup / keep_best_canonical:
    lowercase, then collapse every run of non-alphanumerics (whitespace,
    punctuation, symbols) to a single space, then trim. Both engines
    apply the same regex class to the same lowered string, so the form
    is cross-engine deterministic."""
    return F.trim(F.regexp_replace(F.lower(F.col(content_col)),
                                   "[^a-z0-9]+", " "))


def canonical_dedup(df: DataFrame, content_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Normalization-aware exact dedup: group by md5 of the CANONICAL
    form (lowercased, punctuation/whitespace runs collapsed) instead of
    the raw bytes — the standard first pass of web-corpus cleaning
    (exact dedup misses ``"Hello,  World!"`` vs ``"hello world"``;
    near-dup LSH is overkill for them and pays a shingle pass).

    Output: (canon_md5, rep_id = min id, dup_count, n_variants = count
    of distinct RAW forms inside the group — 1 means exact dedup would
    have caught it, >1 is the formatting-variant surplus this operator
    adds).

    Scale: exact_dedup's shape plus the standard partial-distinct
    phase for n_variants — two exchanges, keyed by (canon, raw) md5
    pairs then canon md5; the full text never shuffles (both keys are
    32-char hashes computed scan-side) and the canonicalization is a
    codegen'd regex over the scan, no extra pass. Reference parity: the reference has no
    dedup at all — this extends its hash-groupBy idiom
    (ProfileJob.java's groupBy(0) pattern) to content identity."""
    canon = _canonical_expr(content_col)
    return (df.where(F.col(content_col).isNotNull())
            .select(F.md5(canon).alias("canon_md5"),
                    F.md5(F.col(content_col)).alias("__raw_md5"),
                    F.col(id_col).alias("__id"))
            .groupBy("canon_md5")
            .agg(F.min("__id").alias("rep_id"),
                 F.count(F.lit(1)).alias("dup_count"),
                 F.count_distinct(F.col("__raw_md5")).alias("n_variants")))


def keep_best_canonical(df: DataFrame, content_col: str = "text",
                        id_col: str = "doc_id",
                        score_col: str | None = None) -> DataFrame:
    """Quality-aware dedup: keep the BEST row per canonical-content group
    (highest score, ties broken by lowest id), preserving every input
    column — the curation-grade upgrade of keep_first, which keeps
    whichever copy happens to have the lowest id even when a later copy
    is longer / cleaner. ``score_col`` defaults to the raw content
    length (keep the most complete variant; a trailing-truncated copy
    canonicalizes equal but scores shorter).

    Scale: one shuffle keyed by the canonical md5 (same note as
    keep_first: a boilerplate mega-group concentrates only its own
    copies, and row_number within a group is a linear scan — no
    quadratic step)."""
    score = (F.col(score_col) if score_col is not None
             else F.length(F.col(content_col)))
    w = (Window.partitionBy(F.md5(_canonical_expr(content_col)))
         .orderBy(score.desc(), F.col(id_col).asc()))
    return (df.where(F.col(content_col).isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def ngram_jaccard_pairs_prefix(df: DataFrame, content_col: str = "text",
                               id_col: str = "doc_id", n: int = 3,
                               threshold: float = 0.3) -> DataFrame:
    """PPJoin-style PREFIX-FILTERED exact n-gram Jaccard pairs — the
    same output as ngram_jaccard_pairs (it gates against the SAME
    oracle SQL), but candidate pairs are generated only from each
    document's rarest shingles instead of all of them.

    Prefix filter (Chaudhuri et al. SSJoin / Xiao et al. PPJoin,
    symmetric form): order shingles globally by (doc frequency, hash) —
    rarest first — and keep each doc's first
    ``p = sz - ceil(t/(1+t) * sz) + 1`` shingles. For jaccard >= t the
    overlap o satisfies o >= ceil(t/(1+t) * (|A|+|B|)) >=
    alpha_A + alpha_B - 1 with alpha_X = ceil(t/(1+t) * |X|), so at
    least one common shingle falls in BOTH prefixes (at most
    alpha_A - 1 common shingles can miss A's prefix and alpha_B - 1
    miss B's) — the filter is LOSSLESS; a pytest pins equality with
    the unfiltered path. Candidates then pass a size filter
    (t * |B| <= |A|, necessary for jaccard >= t) and are verified
    exactly by intersecting the two docs' full shingle-hash arrays.

    Why this is THE 100 TB shape: the quadratic blowup of the plain
    path lives in high-doc-frequency shingles (a shingle shared by k
    docs emits k(k-1)/2 pairs), and rarest-first prefixes exclude
    exactly those — unlike ``max_df``, which bounds the blowup by
    DROPPING frequent shingles and biasing jaccard down, the prefix
    filter is exact. Shuffles: shingle long-format (distinct), one
    doc-frequency groupBy + join back keyed by shingle, one window
    keyed by id, the bucket pair generation keyed by shingle (prefix
    rows only), and the verification join keyed by id against per-doc
    sorted hash arrays (array length = doc shingle count, bounded by
    doc length — the full corpus never cross-joins)."""
    r = threshold / (1.0 + threshold)
    # NOT persisted despite three consumers (docfreq, the rank join,
    # the verification sets): measured at sf0.1 the cache bought
    # nothing here (4.28s -> 4.14-4.29s min-of-3) — this path is
    # dominated by the two per-id windows and the verification join,
    # not the shingle explode; caching a corpus-scale frame that does
    # not pay for itself is pure storage pressure at 100 TB (the r13
    # measure-don't-guess rule; the subplans that DO pay are persisted
    # in _shared_shingle_counts / duplicated_ngram_fraction)
    long = shingle_hashes_long(df, content_col, id_col, n)
    docfreq = long.groupBy("sh").agg(F.count(F.lit(1)).alias("df_docs"))
    w = (Window.partitionBy("id")
         .orderBy(F.col("df_docs").asc(), F.col("sh").asc()))
    wsz = Window.partitionBy("id")
    ranked = (long.join(docfreq, "sh")
              .select("id", "sh", F.row_number().over(w).alias("rk"),
                      F.count(F.lit(1)).over(wsz).alias("sz")))
    prefix_len = (F.col("sz")
                  - F.ceil(F.lit(r) * F.col("sz")).cast("int") + 1)
    prefix = ranked.where(F.col("rk") <= prefix_len)
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> transform("
        "slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS id_a, y AS id_b))))")
    cands = (prefix.groupBy("sh")
             .agg(F.array_sort(F.collect_list("id")).alias("ids"))
             .where(F.size("ids") > 1)
             .select(F.explode(pair_expr).alias("p"))
             .select("p.id_a", "p.id_b").distinct())
    sets = long.groupBy("id").agg(
        F.array_sort(F.collect_list("sh")).alias("hs"),
        F.count(F.lit(1)).alias("sz"))
    a = sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"),
                    F.col("sz").alias("sz_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"),
                    F.col("sz").alias("sz_b"))
    t = F.lit(threshold)
    shared = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    return (cands.join(a, "id_a").join(b, "id_b")
            .where((t * F.col("sz_b") <= F.col("sz_a"))
                   & (t * F.col("sz_a") <= F.col("sz_b")))
            .withColumn("jaccard",
                        shared / (F.col("sz_a") + F.col("sz_b") - shared))
            .where(F.col("jaccard") >= t)
            .select("id_a", "id_b", "jaccard"))


def minhash_calibration(df: DataFrame, content_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        max_bucket: int = 1000) -> DataFrame:
    """MinHash estimator calibration over the LSH candidate pairs:
    (id_a, id_b, est_jaccard, jaccard, abs_err) where est_jaccard is the
    fraction of the K=16 signature slots that agree (the unbiased MinHash
    estimate of Jaccard) and jaccard is the exact shingle-set value. The
    parameter-tuning diagnostic the pair operators themselves can't give
    you: if abs_err runs high at your operating threshold, K is too small
    (estimator stderr = sqrt(j(1-j)/K) ~ 0.125 at j=0.5, K=16) and the
    band/row split needs re-planning BEFORE a 100 TB dedup run commits to
    it; pairs generated per band geometry are the same ones the real run
    would see.

    Cost shape: the banded candidate join and the per-doc signature /
    shingle-set builds are the SAME subplans minhash_dedup_pairs uses
    (one shuffle keyed by (band, key), per-doc groupBys keyed by id);
    the signature comparison adds 16 equality terms on the joined row."""
    banded = _banded(df, content_col, id_col, n)
    sized = banded.withColumn(
        "bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band", "band_key")))
    banded = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, ["band", "band_key"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
    wide = _minhash_wide(df, content_col, id_col, n)
    k = len(H.MINHASH_PARAMS)
    wa = wide.select(F.col("id").alias("id_a"),
                     *[F.col(f"sig_{j}").alias(f"a_{j}") for j in range(k)])
    wb = wide.select(F.col("id").alias("id_b"),
                     *[F.col(f"sig_{j}").alias(f"b_{j}") for j in range(k)])
    sets = (shingle_hashes_long(df, content_col, id_col, n)
            .groupBy("id").agg(F.array_sort(F.collect_list("sh"))
                               .alias("hset")))
    joined = (cand.join(wa, "id_a").join(wb, "id_b")
              .join(sets.withColumnsRenamed(
                  {"id": "id_a", "hset": "hset_a"}), "id_a")
              .join(sets.withColumnsRenamed(
                  {"id": "id_b", "hset": "hset_b"}), "id_b"))
    agree = sum((F.col(f"a_{j}") == F.col(f"b_{j}")).cast("int")
                for j in range(k))
    inter = F.size(F.array_intersect("hset_a", "hset_b"))
    union = F.size(F.array_union("hset_a", "hset_b"))
    est = agree.cast("double") / F.lit(float(k))
    true_j = inter.cast("double") / union.cast("double")
    return joined.select(
        "id_a", "id_b", est.alias("est_jaccard"),
        true_j.alias("jaccard"),
        F.abs(est - true_j).alias("abs_err"))


def cross_source_dups(df: DataFrame, content_col: str = "text",
                      id_col: str = "doc_id",
                      source_col: str = "source") -> DataFrame:
    """Cross-source duplication matrix: for every unordered source pair,
    how many distinct content hashes appear in BOTH — which scrapes/dumps
    overlap (the provenance question behind every dedup campaign: is
    source B a mirror of A, and which one should the keep-rule prefer?).
    Output: (source_a, source_b, n_shared) with source_a < source_b.

    Plan: distinct (md5, source) pairs — one shuffle keyed by the hash —
    then a self-join keyed by the hash whose per-key fan-out is bounded
    by the number of SOURCES carrying that content (not by copies within
    a source, which the distinct collapsed), and a bounded
    (sources x sources) grouped count."""
    hs = (df.where(F.col(content_col).isNotNull())
          .select(F.md5(F.col(content_col)).alias("h"),
                  F.col(source_col).alias("src"))
          .distinct())
    a = hs.select("h", F.col("src").alias("source_a"))
    b = hs.select("h", F.col("src").alias("source_b"))
    return (a.join(b, "h")
            .where(F.col("source_a") < F.col("source_b"))
            .groupBy("source_a", "source_b")
            .agg(F.count(F.lit(1)).alias("n_shared")))


def paragraph_dedup(df: DataFrame, content_col: str = "text",
                    id_col: str = "doc_id",
                    window_tokens: int = 64) -> DataFrame:
    """Sub-document (paragraph-level) duplicated-passage groups: split
    every document into NON-overlapping ``window_tokens`` windows
    (text.chunk_documents with overlap=0 — the deterministic paragraph
    proxy for fixture text without layout), hash each window, and report
    every window appearing in MORE THAN ONE document: (chunk_md5,
    n_docs, n_occurrences, example_doc, n_tokens). The granularity
    between whole-doc dedup (misses a copied paragraph inside an
    otherwise-unique doc) and shingle dup-fraction (per-doc score, no
    extractable passage): what comes back here IS the boilerplate
    passage, addressable by hash for a removal pass.

    Scale: narrow chunking (tokenize + explode a bounded index), then
    the standard two-phase exact-distinct aggregation — a partial
    distinct keyed by (window hash, doc id) and the final rollup keyed
    by the hash (count_distinct(id) needs both; plan-pinned). Window
    text crosses the wire once as its md5 group key; min() carries one
    example id. n_occurrences counts every placement, n_docs distinct
    documents."""
    from flink_descriptive_stats_spark.operators.text import \
        chunk_documents
    chunks = chunk_documents(df, text_col=content_col, id_col=id_col,
                             max_tokens=window_tokens, overlap=0)
    return (chunks
            .groupBy(F.md5(F.col("chunk_text")).alias("chunk_md5"))
            .agg(F.count_distinct("id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"),
                 F.min("id").alias("example_doc"),
                 F.max("n_tokens").alias("n_tokens"))
            .where(F.col("n_docs") > 1))


def dup_rate_by_source(df: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id",
                       source_col: str = "source") -> DataFrame:
    """Per-source duplication scoreboard: (source, n_docs, n_unique_exact,
    n_unique_canonical, exact_dup_rate, canonical_dup_rate) — which feed
    is rotting the corpus, and how much of its "volume" is copies. The
    rate is 1 - unique/docs within the source; the canonical column adds
    the formatting-variant surplus exact hashing misses. Reading this
    table per ingest is how a 100 TB pipeline decides which sources get
    the expensive near-dup pass at all.

    ONE grouped aggregation keyed by source (bounded keys) over two
    scan-side hash projections — count_distinct partials carry hash sets
    per source, the full text never shuffles."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    canon = _canonical_expr(content_col)
    d = (df.where(F.col(content_col).isNotNull())
         .select(F.col(source_col).alias("source"),
                 F.md5(F.col(content_col)).alias("__h"),
                 F.md5(canon).alias("__c")))
    agg = (d.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.count_distinct("__h").alias("n_unique_exact"),
                F.count_distinct("__c").alias("n_unique_canonical")))
    nd = F.col("n_docs").cast("double")
    return agg.select(
        "source", "n_docs", "n_unique_exact", "n_unique_canonical",
        sig6(F.lit(1.0) - F.col("n_unique_exact") / nd)
        .alias("exact_dup_rate"),
        sig6(F.lit(1.0) - F.col("n_unique_canonical") / nd)
        .alias("canonical_dup_rate"))


def incremental_dedup_report(old: DataFrame, new: DataFrame,
                             content_col: str = "text",
                             id_col: str = "doc_id",
                             source_col: str = "source") -> DataFrame:
    """Daily-ingest dedup triage: per source of the NEW batch,
    (source, n_new, n_dup_of_old, n_internal_dup, n_novel) where
    dup_of_old counts new docs whose content already exists in the OLD
    corpus, internal_dup counts further copies within the batch itself
    (beyond each group's first), and novel is the remainder — the
    numbers that decide whether an ingest lands, gets skimmed, or gets
    dropped before any expensive near-dup pass.

    Plan: the old corpus collapses to a distinct content-hash set (one
    groupBy, map-side combined); the new batch left-joins it keyed by
    the hash and aggregates per (source, hash) then per source — every
    shuffle keyed by md5 or the bounded source. Text never moves."""
    oldh = (old.where(F.col(content_col).isNotNull())
            .select(F.md5(F.col(content_col)).alias("__h")).distinct()
            .withColumn("__in_old", F.lit(1)))
    d = (new.where(F.col(content_col).isNotNull())
         .select(F.col(source_col).alias("source"),
                 F.md5(F.col(content_col)).alias("__h")))
    per_hash = (d.groupBy("source", "__h")
                .agg(F.count(F.lit(1)).alias("n"))
                .join(oldh, "__h", "left"))
    is_old = F.col("__in_old").isNotNull()
    return (per_hash.groupBy("source")
            .agg(F.sum("n").alias("n_new"),
                 F.coalesce(F.sum(F.when(is_old, F.col("n"))), F.lit(0))
                 .alias("n_dup_of_old"),
                 F.coalesce(F.sum(F.when(~is_old, F.col("n") - 1)),
                            F.lit(0)).alias("n_internal_dup"),
                 F.count_if(~is_old).alias("n_novel")))


def dedup_corpus_keep_best(df: DataFrame, content_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           threshold: float = 0.5) -> DataFrame:
    """Quality-aware near-dup corpus dedup: keep the HIGHEST-QUALITY
    member of each near-dup cluster (regex quality_score from
    text_stats; ties by lowest id) instead of dedup_corpus's
    lowest-id-wins — on web corpora the near-dup group often contains
    one clean copy and N mangled scrapes, and id order has no opinion
    about which is which. The cluster labels are the memoized
    neardup_clusters pass (shared with dedup_corpus/cluster histograms
    in-process); the quality join adds one scan-shaped text_stats
    subplan keyed by doc id and a per-cluster rank window — cluster
    sizes bound the window partitions."""
    from pyspark.sql import Window

    from flink_descriptive_stats_spark.operators.text import text_stats
    labels = neardup_clusters(df, content_col, id_col, n, threshold)
    score = text_stats(df, text_col=content_col, id_col=id_col).select(
        F.col("id"),
        F.col("quality_score").cast("double").alias("__score"))
    lab = (labels.join(score, "id")
           .withColumn("__rn", F.row_number().over(
               Window.partitionBy("cluster_id")
               .orderBy(F.col("__score").desc(), F.col("id").asc())))
           .where(F.col("__rn") == 1)
           .select(F.col("id").alias(id_col)))
    return df.join(lab, id_col, "semi")


def source_overlap(df: DataFrame, content_col: str = "text",
                   source_col: str = "source",
                   canonical: bool = False) -> DataFrame:
    """Pairwise cross-source duplication matrix: (source_a, source_b,
    n_shared, containment_a, containment_b) for every UNORDERED source
    pair sharing at least one content hash (source_a < source_b
    lexically) — dup_rate_by_source says which feed duplicates ITSELF;
    this says which feeds duplicate EACH OTHER (mirrored crawls,
    re-scraped aggregators), i.e. which source you can drop wholesale.
    n_shared counts distinct shared hashes; containment_x = n_shared /
    that source's distinct hashes (sig6) — asymmetric by design, like
    ngram_containment_pairs. ``canonical=True`` keys on the
    formatting-insensitive canonical form instead of raw bytes.

    Scale: the corpus collapses to DISTINCT (source, 16-byte-hash)
    rows first, so the self-join exchanges hash-scale rows (never
    text) and equi-joins on the hash; output is bounded by sources^2.
    Per-side distinct counts ride the same frame."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    key = (F.md5(_canonical_expr(content_col)) if canonical
           else F.md5(F.col(content_col)))
    h = (df.where(F.col(content_col).isNotNull())
         .select(F.col(source_col).alias("__s"), key.alias("__h"))
         .distinct())
    per = h.groupBy("__s").agg(F.count(F.lit(1)).alias("__n"))
    a = h.select(F.col("__s").alias("source_a"), "__h")
    b = h.select(F.col("__s").alias("source_b"), "__h")
    shared = (a.join(b, "__h")
              .where(F.col("source_a") < F.col("source_b"))
              .groupBy("source_a", "source_b")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    na = per.select(F.col("__s").alias("source_a"),
                    F.col("__n").alias("__na"))
    nb = per.select(F.col("__s").alias("source_b"),
                    F.col("__n").alias("__nb"))
    return (shared.join(F.broadcast(na), "source_a")
            .join(F.broadcast(nb), "source_b")
            .select("source_a", "source_b", "n_shared",
                    sig6(F.col("n_shared").cast("double")
                         / F.col("__na").cast("double"))
                    .alias("containment_a"),
                    sig6(F.col("n_shared").cast("double")
                         / F.col("__nb").cast("double"))
                    .alias("containment_b")))


def source_overlap_fuzzy(df: DataFrame, content_col: str = "text",
                         id_col: str = "doc_id",
                         source_col: str = "source",
                         threshold: float = 0.5,
                         max_bucket: int = 1000) -> DataFrame:
    """The NEAR-dup companion of source_overlap: (source_a, source_b,
    n_pairs) per unordered cross-source pair, counting verified
    MinHash-LSH near-duplicate pairs (jaccard >= threshold) whose two
    docs live in DIFFERENT sources — exact hashing catches mirrored
    feeds, this catches re-edited/boilerplate-shifted mirrors.
    Within-source pairs are dup_rate_by_source territory and excluded;
    source order is normalized lexically.

    Scale: minhash_dedup_pairs emits (id_a, id_b) only; the two
    source lookups are doc-scale equi-joins on tiny rows, then one
    bounded groupBy — the pair funnel (banded buckets, skew cap,
    exact verify) is unchanged."""
    pairs = minhash_dedup_pairs(df, content_col=content_col,
                                id_col=id_col, threshold=threshold,
                                max_bucket=max_bucket)
    ids = df.select(F.col(id_col).alias("__id"),
                    F.col(source_col).alias("__src"))
    j = (pairs
         .join(ids.select(F.col("__id").alias("id_a"),
                          F.col("__src").alias("__sa")), "id_a")
         .join(ids.select(F.col("__id").alias("id_b"),
                          F.col("__src").alias("__sb")), "id_b")
         .where(F.col("__sa") != F.col("__sb")))
    return (j.select(F.least("__sa", "__sb").alias("source_a"),
                     F.greatest("__sa", "__sb").alias("source_b"))
            .groupBy("source_a", "source_b")
            .agg(F.count(F.lit(1)).alias("n_pairs")))


# --------------------------------------------------------------------------
# cross-document repeated-span removal (r11 — the substring granularity
# doc- and paragraph-level dedup both miss: boilerplate headers/footers)
# --------------------------------------------------------------------------

def _span_base(df: DataFrame, text_col: str,
               id_col: str) -> DataFrame:
    """The shared narrow word/separator projection of the span family:
    (id, __text, __w words, __lead, __trail, __core internal
    separators) — one codegen Project over the scan."""
    from flink_descriptive_stats_spark.functions.spread import spread
    t = F.col(text_col)
    # adaptive input spread (guide §2.5): the regex splits here and the
    # n-gram hashing above run fused into the scan stage — on a
    # single-row-group corpus that is ONE core for the whole span
    # family. The exchange carries only (id, text); no-op at scale.
    narrow = spread(df.where(t.isNotNull())
                    .select(F.col(id_col).alias("id"),
                            t.alias("__text")), ["id"])
    t = F.col("__text")
    base = (narrow
            .select("id", "__text",
                    F.regexp_extract_all(t, F.lit(r"\S+"), 0)
                    .alias("__w"),
                    F.regexp_extract(t, r"^\s*", 0).alias("__lead"),
                    F.regexp_extract(t, r"\s*$", 0).alias("__trail"),
                    F.regexp_extract_all(t, F.lit(r"\s+"), 0)
                    .alias("__seps")))
    m = F.size("__w")
    # the m-1 INTERNAL separators: drop the leading/trailing runs
    core = F.slice(F.col("__seps"),
                   F.when(F.col("__lead") != "", F.lit(2))
                   .otherwise(F.lit(1)),
                   F.greatest(m - 1, F.lit(0)))
    return base.withColumn("__core", core).drop("__seps")


def remove_repeated_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", min_ngram: int = 5,
                          min_df: int | dict[int, int] = 5,
                          max_ngram: int | None = None) -> DataFrame:
    """Strip cross-document repeated spans — the exact-substring dedup
    stage every large corpus-curation pipeline applies AFTER doc-level
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better" motivates it): site headers, footers, cookie
    banners and licence blurbs survive exact/canonical/near dedup
    (the surrounding document is unique) and paragraph_dedup (they
    are rarely their own paragraph). The reference has no analog (it
    profiles typed columns, ProfileJob.java:86-98).

    Contract (token-level, deterministic, oracle-replayable):

    - a WORD is a whitespace-delimited run (``\\S+``) of the ORIGINAL
      text; matching is case-insensitive (the word-n-gram identity is
      ``lower(words[i..i+n))`` joined by one space, hashed with the
      engine's md5 hash family) but the text is never case-mangled.
    - an n-gram (n = ``min_ngram``) is REPEATED when its document
      frequency — DISTINCT docs containing it — is >= ``min_df``.
      Within-doc repetition alone never qualifies (that is
      repetition_stats' dimension); this operator targets
      cross-document boilerplate.
    - a word position is covered when ANY repeated n-gram occurrence
      spans it; covered positions consolidate into maximal spans and
      are removed. Docs with < n words emit no n-grams and pass
      through untouched (whole-short-doc duplication is exact dedup's
      job).
    - rewrite: an untouched doc returns its text byte-identical.
      In a modified doc every contiguous KEPT region keeps its
      original bytes (each kept word is re-joined with the original
      separator that preceded it); where a span was removed between
      two kept words they splice with ONE space; leading/trailing
      whitespace survives only if the first/last word survives.

    Returns (id, text_clean, n_tokens, n_tokens_removed,
    n_spans_removed). NULL-text rows are out of scope.

    Scale: never all-pairs — the n-gram document-frequency pass is a
    distinct + one bounded groupBy on the 8-byte shingle hash; the
    repeated set joins back by hash (one row per hash on the build
    side, so a boilerplate shingle present in EVERY doc skews no
    pair explosion); covered positions are per-doc bounded arrays
    (collect_set bounded by doc length); the rewrite itself is
    per-row array math, no Python anywhere.

    ``max_ngram`` (r12, VERDICT r11 missing #2): single-n mining is
    blind to repeated runs SHORTER than n, and one DF threshold cannot
    distinguish an organically common 5-gram from a distinctive
    12-gram footer. max_ngram=None (the default) keeps the single-n
    contract byte-identical (the gated/oracle path). max_ngram > n
    mines EVERY length in [min_ngram, max_ngram] in ONE positional
    pass — the length rides the explode next to the start index, the
    gram is a variable-length array slice, and the length is FOLDED
    INTO THE HASH ("{n}:{gram}") so lengths never alias; coverage is
    the union over all lengths and the rewrite is unchanged (same
    _span_rewrite_select bundle). ``min_df`` may then be a {n: df}
    dict — stricter thresholds for shorter, organically commoner
    n-grams — and must cover every mined length. Cost: the positional
    frame grows ~len(ns)-fold, still hash-keyed and never all-pairs.

    The single-n BOUNDARY is pinned in tests either way: a planted
    4-word banner survives min_ngram=5 single-n mining untouched and
    the multi-n pass at min_ngram=4 removes it."""
    if min_ngram < 2:
        raise ValueError(f"min_ngram must be >= 2, got {min_ngram}")
    n = int(min_ngram)
    ns = [n] if max_ngram is None else list(range(n, int(max_ngram) + 1))
    if not ns:
        raise ValueError(
            f"max_ngram must be >= min_ngram, got {max_ngram} < {n}")
    _validate_min_df(min_df, ns)
    # base is NOT cached: it carries full text, and materializing it
    # measured SLOWER than recomputing from the scan (sf0.1: 7.6s vs
    # the shipped 3.5s — see the positional-persist note below)
    base = _span_base(df, text_col, id_col)
    m = F.size("__w")
    if len(ns) == 1:
        # single-n: the original (gated, oracle-mirrored) shape —
        # positional n-gram hashes via explode + element_at (the
        # shingle_hashes_long codegen shape), hash WITHOUT the length
        # folded in, byte-identical to the r11 contract
        idx = F.explode(F.sequence(F.lit(0), m - n))
        gram = F.lower(F.concat_ws(
            " ", *[F.element_at("__w", F.col("__i") + j + 1)
                   for j in range(n)]))
        pos = _persist_pos(
            base.where(m >= n)
            .select("id", idx.alias("__i"), "__w")
            .select("id", "__i",
                    F.pmod(H.token_hash(gram),
                           F.lit(H.MERSENNE_P)).alias("__sh")))
        rep = (pos.select("__sh", "id").distinct()
               .groupBy("__sh").agg(F.count(F.lit(1)).alias("__dfc"))
               .where(F.col("__dfc") >= min_df).select("__sh"))
        covered = (pos.join(rep, "__sh")
                   .select("id", F.explode(
                       F.sequence(F.col("__i"),
                                  F.col("__i") + n - 1)).alias("__j"))
                   .distinct()
                   .groupBy("id")
                   .agg(F.array_sort(F.collect_set("__j"))
                        .alias("__cov")))
    else:
        covered = _multi_n_covered(base, ns, min_df)
    j = base.join(covered, "id", "left")
    return _span_rewrite_select(j)


#: the last-K persisted narrow frames (see _persist_pos): a lazy
#: operator cannot unpersist behind its own returned result, and
#: DataFrame.persist entries are never GC-collected, so without a bound
#: a long session (or a 259-query bench) accumulates stale cached
#: frames until storage starves execution — measured: the star-CC
#: clusterer (cache-hungry iterative localCheckpoints) ran 3.8s alone
#: but ~11s late in a bench that had leaked every prior persist.
#: Evicting beyond K is always SAFE: an evicted frame that a still-lazy
#: result later references simply recomputes (the pre-persist plan).
_PERSISTED_NARROW: list = []
_PERSISTED_NARROW_KEEP = 8


def _persist_pos(pos: DataFrame) -> DataFrame:
    """Cache a multiply-consumed NARROW derived frame — the span
    miner's positional hashes (id, __i [, __n], __sh) and the shingle
    family's long frame (id, sh): a handful of ints per row, consumed
    2-3x (a DF aggregate plus one or two join-backs), where without a
    cache each consumer recomputes the whole explode subtree from the
    parquet scan. Measured at sf0.1 (min of 3, r13): multi-length
    miner 6.94s -> 3.53s; duplicated_ngram_fraction 1.4s -> ~0.8s;
    jaccard/containment ~ -10%. Where measurement showed NO win (the
    PPJoin prefix path — window/join-dominated) the frame is
    deliberately not persisted. Losers documented:
    localCheckpoint was marginally faster (3.17s) but truncates
    lineage — an executor loss mid-job becomes irrecoverable, the
    wrong trade on a 1000-executor cluster where node loss is
    routine; persisting the full-text base was SLOWER than
    recomputing (7.6s). MEMORY_AND_DISK, so a corpus whose positions
    outgrow storage memory spills instead of OOMing. The module keeps
    only the last _PERSISTED_NARROW_KEEP frames cached (older ones
    unpersist non-blocking) so repeated calls across a long session
    cannot starve storage — the measured failure mode above."""
    from pyspark.storagelevel import StorageLevel
    out = pos.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_NARROW.append(out)
    while len(_PERSISTED_NARROW) > _PERSISTED_NARROW_KEEP:
        old = _PERSISTED_NARROW.pop(0)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to release
    return out


def _multi_n_grams(base: DataFrame, ns: list[int]) -> DataFrame:
    """The shared multi-length positional scaffold: (id, __i, __n,
    __gram) from a frame carrying a materialized ``__w`` word array —
    every length in ``ns`` rides one explode next to the start index,
    the gram is a variable-length lowercased slice. ONE definition so
    the remover (_multi_n_covered) and the triage view
    (boilerplate_ngrams max_ngram) cannot drift."""
    m = F.size("__w")
    gram = F.lower(F.concat_ws(
        " ", F.slice("__w", F.col("__i") + 1, F.col("__n"))))
    return (base.where(m >= min(ns))
            .select("id", "__w",
                    F.explode(F.array(*[F.lit(k) for k in ns]))
                    .alias("__n"))
            .where(m >= F.col("__n"))
            .select("id", "__w", "__n",
                    F.explode(F.sequence(F.lit(0), m - F.col("__n")))
                    .alias("__i"))
            .select("id", "__i", "__n", gram.alias("__gram")))


def _per_n_threshold(min_df, n_col: str) -> F.Column:
    """The per-length DF threshold as a Column over ``n_col``: a plain
    literal for scalar ``min_df``, a CASE on the n-gram length for the
    {n: df} dict form — ONE definition shared by the remover
    (_multi_n_covered) and the triage view (boilerplate_ngrams
    max_ngram), so a dict-threshold despan can always be previewed
    with matching parameters (ADVICE r12)."""
    if isinstance(min_df, dict):
        thr = None
        for k, v in sorted(min_df.items()):
            cond = F.col(n_col) == int(k)
            thr = (F.when(cond, F.lit(int(v))) if thr is None
                   else thr.when(cond, F.lit(int(v))))
        return thr
    return F.lit(int(min_df))


def _validate_min_df(min_df, ns: list[int]) -> None:
    """Shared {n: df}/scalar validation for the span-mining family:
    a dict needs a real multi-length range, must cover every mined
    length, and every threshold must be >= 2 (df=1 would mark every
    n-gram repeated). Raises the same messages remove_repeated_spans
    always raised, now also from boilerplate_ngrams instead of an
    opaque Column-comparison error (ADVICE r12)."""
    if isinstance(min_df, dict):
        if len(ns) == 1:
            raise ValueError("per-n min_df needs max_ngram > min_ngram")
        missing = [k for k in ns if k not in min_df]
        if missing:
            raise ValueError(f"min_df dict missing lengths {missing}")
        if any(v < 2 for v in min_df.values()):
            raise ValueError(f"every min_df must be >= 2, got {min_df}")
    elif min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")


def _multi_n_covered(base: DataFrame, ns: list[int],
                     min_df) -> DataFrame:
    """Multi-length positional mining: (id, __cov) coverage from every
    n in ``ns`` in ONE pass over the word arrays — the hash input is
    "{n}:{gram}" (length folded in, mirrored literally by the oracle's
    nn::VARCHAR || ':' || gram)."""
    pos = _persist_pos(
        _multi_n_grams(base, ns)
        .select("id", "__i", "__n",
                F.pmod(H.token_hash(F.concat(
                    F.col("__n").cast("string"), F.lit(":"),
                    F.col("__gram"))),
                    F.lit(H.MERSENNE_P)).alias("__sh")))
    thr = _per_n_threshold(min_df, "__n")
    # __n is functionally determined by __sh (it is folded into the
    # hash) — grouping by both keeps it addressable for the per-n
    # threshold without changing the key's cardinality
    rep = (pos.select("__sh", "__n", "id").distinct()
           .groupBy("__sh", "__n")
           .agg(F.count(F.lit(1)).alias("__dfc"))
           .where(F.col("__dfc") >= thr).select("__sh"))
    return (pos.join(rep, "__sh")
            .select("id", F.explode(
                F.sequence(F.col("__i"),
                           F.col("__i") + F.col("__n") - 1)).alias("__j"))
            .distinct()
            .groupBy("id")
            .agg(F.array_sort(F.collect_set("__j")).alias("__cov")))


def _span_rewrite_select(j: DataFrame) -> DataFrame:
    """The separator-preserving rewrite shared by remove_repeated_spans
    (corpus-mined coverage) and remove_listed_spans (frozen-list
    coverage): ``j`` carries (id, __text, __w, __lead, __trail,
    __core, __cov nullable sorted int array) — ONE expression bundle,
    so the two operators' rewrite semantics cannot drift."""
    m = F.size("__w")
    cov = F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
    kept = F.filter(
        F.transform("__w", lambda w, i: F.struct(w.alias("w"),
                                                 i.alias("i"))),
        lambda s: ~F.array_contains(cov, s["i"]))
    # rebuild: each kept word carries the ORIGINAL separator that
    # preceded it; across a removed span the splice is one space; the
    # accumulator carries (text so far, previous kept index)
    body = F.aggregate(
        kept,
        F.struct(F.lit("").alias("s"), F.lit(-2).cast("int").alias("p")),
        lambda acc, x: F.struct(
            F.concat(
                acc["s"],
                F.when(acc["p"] == -2, F.lit(""))
                .when(acc["p"] == x["i"] - 1,
                      F.element_at("__core", x["i"]))
                .otherwise(F.lit(" ")),
                x["w"]).alias("s"),
            x["i"].cast("int").alias("p")),
        lambda acc: acc["s"])
    first_kept = ~F.array_contains(cov, F.lit(0))
    last_kept = ~F.array_contains(cov, m - 1)
    n_rm = F.size(cov)
    rebuilt = F.concat(
        F.when(first_kept, F.col("__lead")).otherwise(F.lit("")),
        body,
        F.when(last_kept, F.col("__trail")).otherwise(F.lit("")))
    spans = F.size(F.filter(
        cov, lambda x: ~F.array_contains(cov, x - 1)))
    return j.select(
        "id",
        F.when(n_rm == 0, F.col("__text")).otherwise(rebuilt)
        .alias("text_clean"),
        m.cast("bigint").alias("n_tokens"),
        n_rm.cast("bigint").alias("n_tokens_removed"),
        F.when(n_rm == 0, F.lit(0)).otherwise(spans)
        .cast("bigint").alias("n_spans_removed"))


# ASCII whitespace only — the SAME class Java regex \s matches
# ([ \t\n\x0B\f\r]), which is what the engine's word tokenizer (\S+ /
# \s+ in _span_base and the sp_w2 oracle CTE) splits documents on.
_ASCII_WS_RE = re.compile(r"(?a)\s+")


def _phrase_tokens(ph: str, caller: str) -> list[str]:
    """Split a frozen phrase into lowercased words with the engine's
    OWN whitespace class. Python's str.split() treats Unicode
    whitespace (U+00A0, U+2009, ...) as separators while the document
    side's Java-regex ``\\S+`` does not — a phrase containing one
    would silently tokenize differently from the documents and never
    match. ASCII-regex splitting keeps such characters INSIDE the
    token, where they compare literally against the document word
    (ADVICE r11: phrase/text tokenization must agree)."""
    toks = [t.lower() for t in _ASCII_WS_RE.split(ph) if t]
    if not toks:
        raise ValueError(f"{caller}: empty phrase")
    return toks


def remove_listed_spans(df: DataFrame, phrases: list[str],
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Strip a FROZEN boilerplate list — the map-only, stateless
    sibling of remove_repeated_spans and the second half of the 100 TB
    recipe: MINE the boilerplate once on a bounded sample
    (boilerplate_ngrams), freeze the list, then APPLY it everywhere at
    scan speed — no document-frequency pass, no shuffle, no state, so
    it also runs as-is under Structured Streaming (stateless per row;
    pinned streaming == batch).

    Matching/removal contract identical to remove_repeated_spans (ONE
    shared rewrite bundle, _span_rewrite_select): phrases match as
    lowercased whitespace-delimited word sequences at any position;
    covered positions consolidate into maximal spans; untouched docs
    return byte-identical text; kept regions keep their original
    bytes. ``phrases`` is policy-scale (folded as literal expressions,
    block_domains-style — thousands, not data-scale); each phrase
    must contain at least one word."""
    norm: list[list[str]] = [_phrase_tokens(ph, "remove_listed_spans")
                             for ph in phrases]
    if not norm:
        raise ValueError("remove_listed_spans needs at least one phrase")
    base = _span_base(df, text_col, id_col)
    m = F.size("__w")
    # per-position matching compares each token with ONE element_at on
    # the materialized __w COLUMN (lowered per element) — never an
    # element_at over a derived-array EXPRESSION, which Catalyst
    # re-evaluates per lookup and turns matching into O(m^2 * L) per
    # doc (measured 86s at sf0.1 before this shape; ~3s after)
    def _mk_match(toks):
        # single-arg closure: F.filter inspects arity and would feed
        # the element INDEX into any second parameter
        def _match(i):
            out = None
            for k, tk in enumerate(toks):
                eq = (F.lower(F.element_at("__w", i + k + 1))
                      == F.lit(tk))
                out = eq if out is None else (out & eq)
            return out
        return _match

    per_phrase = []
    for toks in norm:
        L = len(toks)
        starts = F.filter(F.sequence(F.lit(0), m - L), _mk_match(toks))
        per_phrase.append(F.when(
            m >= L,
            F.flatten(F.transform(
                starts, lambda i: F.sequence(i, i + L - 1)))
        ).otherwise(F.array().cast("array<int>")))
    # array_distinct on the single-phrase path too (ADVICE r11): a
    # SELF-OVERLAPPING phrase ("ha ha ha" matching at starts 0 and 1
    # of "ha ha ha ha") covers the shared positions twice, inflating
    # n_tokens_removed past the oracle's DISTINCT coverage
    cov = F.array_sort(F.array_distinct(
        F.concat(*per_phrase) if len(per_phrase) > 1 else per_phrase[0]))
    j = base.withColumn("__covraw", cov).withColumn(
        "__cov", F.when(F.size("__covraw") > 0, F.col("__covraw"))) \
        .drop("__covraw")
    return _span_rewrite_select(j)


# deterministic boilerplate fixture (cross-doc header/footer planted by
# doc_id) — the test tables are clean, so the gated span-removal query
# derives its adversarial input from these module constants and the
# oracle rebuilds the SAME constants (oracle_pipeline.
# remove_repeated_spans_sql). Plain ASCII, no quotes/backslashes.
SPAN_HEADER = "Subscribe To Our Newsletter For Daily Updates"
#: the shared eval-quote fixture for decontaminate_spans: appended to
#: EVERY holdout doc (doc_id%10==0, the gated split) and to train docs
#: with doc_id % QUOTE_TRAIN_MOD == 1 — the planted contamination the
#: surgical pass must remove. 9 words, plain ASCII, no quotes.
EVAL_QUOTE = "The quick benchmark question asks about seven distinct answers"
QUOTE_TRAIN_MOD = 7


def synth_quote_expr(text_col: str, id_col: str) -> F.Column:
    """documents.text with the eval quote planted (see EVAL_QUOTE) —
    the Spark side of the decontaminate_spans fixture (SQL twin in
    oracle_pipeline.decontaminate_spans_sql)."""
    i = F.col(id_col)
    hit = (i % 10 == 0) | (i % QUOTE_TRAIN_MOD == 1)
    return (F.when(hit, F.concat(F.col(text_col),
                                 F.lit(" " + EVAL_QUOTE)))
            .otherwise(F.col(text_col)))

SPAN_FOOTER = "All Rights Reserved See Our Terms Of Service"
SPAN_HEADER_MOD = 3   # doc_id % 3 != 2 -> header prepended + one space
SPAN_FOOTER_MOD = 4   # doc_id % 4 == 0 -> TWO spaces + footer appended
#: the 4-word banner of the MULTI-N fixture: invisible to single-n
#: mining at min_ngram=5 (the pinned boundary), removed by the
#: multi-n pass at min_ngram=4. Plain ASCII, no quotes/backslashes.
SPAN_SHORT = "Click Here To Unsubscribe"
SPAN_SHORT_MOD = 5    # doc_id % 5 == 1 -> one space + banner appended


def synth_span_multi_expr(text_col: str, id_col: str) -> F.Column:
    """documents.text with the single-n fixture (synth_span_expr)
    PLUS the 4-word banner appended LAST on doc_id % 5 == 1 — the
    Spark side of the multi-n span fixture (SQL twin in
    oracle_pipeline.remove_repeated_spans_multi_sql)."""
    i = F.col(id_col)
    t1 = synth_span_expr(text_col, id_col)
    return (F.when(i % SPAN_SHORT_MOD == 1,
                   F.concat(t1, F.lit(" " + SPAN_SHORT)))
            .otherwise(t1))


def synth_span_expr(text_col: str, id_col: str) -> F.Column:
    """documents.text with the shared boilerplate planted (see the
    constants above) — the Spark side of the span-removal fixture. The
    footer's two-space join pins separator handling; the mixed-case
    header pins case-insensitive matching with case-preserving
    output."""
    i = F.col(id_col)
    t0 = (F.when(i % SPAN_HEADER_MOD != SPAN_HEADER_MOD - 1,
                 F.concat(F.lit(SPAN_HEADER + " "), F.col(text_col)))
          .otherwise(F.col(text_col)))
    return (F.when(i % SPAN_FOOTER_MOD == 0,
                   F.concat(t0, F.lit("  " + SPAN_FOOTER)))
            .otherwise(t0))


def boilerplate_ngrams(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", min_ngram: int = 5,
                       min_df: int | dict[int, int] = 5, k: int = 20,
                       max_ngram: int | None = None) -> DataFrame:
    """The triage view BEFORE remove_repeated_spans: the top-``k``
    cross-document repeated word n-grams as STRINGS — (ngram, df_docs)
    ordered by document frequency — so an operator can read the actual
    boilerplate ("subscribe to our newsletter...") and choose min_df
    before committing a 100 TB rewrite. Same word/casing contract as
    remove_repeated_spans (whitespace-delimited words, lowercased
    n-gram identity); deterministic ties (df desc, then ngram asc).

    ``max_ngram`` (r12): the multi-length miner's triage sibling —
    every length in [min_ngram, max_ngram] ranked in ONE pass, with
    an extra ``ngram_len`` column and (df desc, len desc, ngram asc)
    ties so the longest form of a nested repeat surfaces first; the
    default (None) keeps the single-length (ngram, df_docs) schema
    byte-identical. ``min_df`` then accepts the remover's {n: df}
    dict (per-length thresholds, same validation), so a
    dict-threshold remove_repeated_spans can be PREVIEWED with
    matching parameters — the triage contract (ADVICE r12).

    Scale: distinct (id, ngram) then ONE bounded groupBy(ngram) with
    HAVING df >= min_df — the n-gram strings ride the shuffle (the
    report must SHOW them; the removal operator itself stays on 8-byte
    hashes), the same string-keyed shape as topk_tokens; the output is
    a k-row frame."""
    if min_ngram < 2:
        raise ValueError(f"min_ngram must be >= 2, got {min_ngram}")
    n = int(min_ngram)
    ns = [n] if max_ngram is None else list(range(n, int(max_ngram) + 1))
    if not ns:
        raise ValueError(
            f"max_ngram must be >= min_ngram, got {max_ngram} < {n}")
    _validate_min_df(min_df, ns)
    t = F.col(text_col)
    base = (df.where(t.isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.regexp_extract_all(t, F.lit(r"\S+"), 0)
                    .alias("__w")))
    m = F.size("__w")
    if max_ngram is not None:
        pos = (_multi_n_grams(base, ns)
               .select("id", F.col("__n").alias("ngram_len"),
                       F.col("__gram").alias("ngram")))
        return (pos.distinct()
                .groupBy("ngram", "ngram_len")
                .agg(F.count(F.lit(1)).alias("df_docs"))
                .where(F.col("df_docs") >=
                       _per_n_threshold(min_df, "ngram_len"))
                .orderBy(F.col("df_docs").desc(),
                         F.col("ngram_len").desc(), F.col("ngram"))
                .limit(k)
                .select("ngram", F.col("ngram_len").cast("int")
                        .alias("ngram_len"), "df_docs"))
    idx = F.explode(F.sequence(F.lit(0), m - n))
    gram = F.lower(F.concat_ws(
        " ", *[F.element_at("__w", F.col("__i") + j + 1)
               for j in range(n)]))
    return (base.where(m >= n)
            .select("id", idx.alias("__i"), "__w")
            .select("id", gram.alias("ngram")).distinct()
            .groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("df_docs"))
            .where(F.col("df_docs") >= min_df)
            .orderBy(F.col("df_docs").desc(), F.col("ngram"))
            .limit(k))


def span_removal_stats(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", min_ngram: int = 5,
                       min_df: int | dict[int, int] = 5,
                       max_ngram: int | None = None) -> DataFrame:
    """The corpus-level effect view of remove_repeated_spans — ONE row
    (n_docs, n_docs_affected, affected_doc_fraction, n_tokens,
    n_tokens_removed, removed_token_fraction, n_spans_removed): what a
    despan stage would do to this corpus, as a bounded aggregate you
    can read before (or monitor after) committing the rewrite. sig6
    fractions; counts raw. ``max_ngram``/dict ``min_df`` preview the
    multi-length pass with the remover's own parameters (r12)."""
    from flink_descriptive_stats_spark.functions.sig import sig6
    out = remove_repeated_spans(df, text_col=text_col, id_col=id_col,
                                min_ngram=min_ngram, min_df=min_df,
                                max_ngram=max_ngram)
    nd, rm = F.col("n_docs"), F.col("rm")
    tok = F.col("tok")
    return (out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("n_tokens_removed") > 0).alias("aff"),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_tokens_removed").alias("rm"),
        F.sum("n_spans_removed").alias("sp"))
        .select(
            nd.alias("n_docs"),
            F.col("aff").alias("n_docs_affected"),
            sig6(F.col("aff").cast("double")
                 / nd.cast("double")).alias("affected_doc_fraction"),
            tok.alias("n_tokens"),
            rm.alias("n_tokens_removed"),
            sig6(rm.cast("double")
                 / tok.cast("double")).alias("removed_token_fraction"),
            F.col("sp").alias("n_spans_removed")))


def decontaminate_spans(train: DataFrame, holdout: DataFrame,
                        content_col: str = "text",
                        id_col: str = "doc_id",
                        min_ngram: int = 5) -> DataFrame:
    """SURGICAL span-level decontamination — the third granularity of
    the decontamination story: `decontaminate` drops whole train docs
    whose content matches the holdout, `contamination_report` measures
    n-gram overlap per doc, and this REWRITES: every train span whose
    ``min_ngram``-word sequence appears ANYWHERE in the holdout is
    removed, the rest of the document survives byte-identical — the
    choice when a long document merely QUOTES an eval item and
    dropping it whole would waste good text.

    Matching/removal contract shared with the repeated-span family
    (ONE rewrite bundle, _span_rewrite_select): lowercased
    whitespace-delimited word n-grams, covered positions consolidated
    into maximal spans, untouched docs byte-identical, kept regions
    keep their original bytes, one-space splice at removal points.
    Returns (id, text_clean, n_tokens, n_tokens_removed,
    n_spans_removed) — feed n_tokens_removed > 0 to quarantine
    reports; docs with < min_ngram words pass through (exact/fuzzy
    decontamination already covers whole-short-doc matches).

    Scale: the holdout collapses to its DISTINCT 8-byte n-gram hashes
    (eval sets are small — AQE broadcasts them); the train side pays
    the positional-shingle explode and ONE hash equi-join; full text
    rides only the final id-keyed rewrite join. Never all-pairs."""
    if min_ngram < 2:
        raise ValueError(f"min_ngram must be >= 2, got {min_ngram}")
    n = int(min_ngram)
    base = _span_base(train, content_col, id_col)
    m = F.size("__w")
    idx = F.explode(F.sequence(F.lit(0), m - n))
    gram = F.lower(F.concat_ws(
        " ", *[F.element_at("__w", F.col("__i") + j + 1)
               for j in range(n)]))
    pos = (base.where(m >= n)
           .select("id", idx.alias("__i"), "__w")
           .select("id", "__i",
                   F.pmod(H.token_hash(gram),
                          F.lit(H.MERSENNE_P)).alias("__sh")))
    hb = _span_base(holdout, content_col, id_col)
    hm = F.size("__w")
    hidx = F.explode(F.sequence(F.lit(0), hm - n))
    hgram = F.lower(F.concat_ws(
        " ", *[F.element_at("__w", F.col("__i") + j + 1)
               for j in range(n)]))
    hset = (hb.where(hm >= n)
            .select(hidx.alias("__i"), "__w")
            .select(F.pmod(H.token_hash(hgram),
                           F.lit(H.MERSENNE_P)).alias("__sh"))
            .distinct())
    covered = (pos.join(hset, "__sh")
               .select("id", F.explode(
                   F.sequence(F.col("__i"),
                              F.col("__i") + n - 1)).alias("__j"))
               .distinct()
               .groupBy("id")
               .agg(F.array_sort(F.collect_set("__j")).alias("__cov")))
    j = base.join(covered, "id", "left")
    return _span_rewrite_select(j)


def boilerplate_by_source(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          source_col: str = "source",
                          min_ngram: int = 5, min_df: int = 5,
                          k: int = 20) -> DataFrame:
    """WHICH source ships the boilerplate: (ngram, source, df_docs)
    for every n-gram in the corpus-level top-``k`` (boilerplate_ngrams'
    exact contract — same candidate set, pinned), with df_docs counted
    per source — the upstream-ticket view of the span family, the
    same triage relationship dataset_card_by_source has to the corpus
    card. NULL-source docs belong to no slice (the by-source
    convention).

    Scale: one distinct (id, source, ngram) long format + ONE bounded
    groupBy, semi-joined to the k-row global top (broadcast); the
    n-gram strings ride the shuffle once, the report's price."""
    top = boilerplate_ngrams(df, text_col=text_col, id_col=id_col,
                             min_ngram=min_ngram, min_df=min_df, k=k) \
        .select("ngram")
    n = int(min_ngram)
    t = F.col(text_col)
    base = (df.where(t.isNotNull() & F.col(source_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.col(source_col).alias("source"),
                    F.regexp_extract_all(t, F.lit(r"\S+"), 0)
                    .alias("__w")))
    m = F.size("__w")
    idx = F.explode(F.sequence(F.lit(0), m - n))
    gram = F.lower(F.concat_ws(
        " ", *[F.element_at("__w", F.col("__i") + j + 1)
               for j in range(n)]))
    return (base.where(m >= n)
            .select("id", "source", idx.alias("__i"), "__w")
            .select("id", "source", gram.alias("ngram")).distinct()
            .join(F.broadcast(top), "ngram")
            .groupBy("ngram", "source")
            .agg(F.count(F.lit(1)).alias("df_docs")))


#: the repeated nav/menu line of the line-dedup fixture (plain ASCII).
LINE_NAV = "Home | About | Contact | Privacy Policy"
LINE_NAV_MOD = 2      # doc_id % 2 == 0 -> nav planted 3x + a blank line

#: dedup_lines' default degenerate-page guard (r13): docs with more
#: lines pass through untouched. ONE constant shared by dedup_lines,
#: dedup_lines_rewrite, the CLI flag default, AND both DuckDB mirrors
#: (dedup_lines_sql, curate_corpus_lines_sql) — the CARD_SKETCHED
#: discipline: a threshold that exists on two engines lives in one place
#: so the sides cannot drift (r13 self-review #2).
DEDUP_MAX_LINES = 100_000


def synth_lines_expr(text_col: str, id_col: str) -> F.Column:
    """documents.text rebuilt as a multi-line page with the nav line
    planted (see LINE_NAV) — the Spark side of the dedup_lines
    fixture (SQL twin in oracle_pipeline.dedup_lines_sql). Even docs:
    nav, body, nav, blank, nav (two removable repeats + a kept blank);
    odd docs: body, nav (nothing to remove)."""
    i, t = F.col(id_col), F.col(text_col)
    nav = F.lit(LINE_NAV)
    return (F.when(i % LINE_NAV_MOD == 0,
                   F.concat(nav, F.lit("\n"), t, F.lit("\n"), nav,
                            F.lit("\n\n"), nav))
            .otherwise(F.concat(t, F.lit("\n"), nav)))


def dedup_lines(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                max_lines: int | None = DEDUP_MAX_LINES) -> DataFrame:
    """WITHIN-document repeated-line removal — the page-level cleanup
    stage public crawl pipelines run before any cross-document dedup
    (CCNet / RefinedWeb drop repeated nav menus, cookie bars and
    footer lines that a scraper duplicates inside one page). The
    reference has no analog (it profiles typed columns,
    ProfileJob.java:86-98); the cross-document siblings are
    paragraph_dedup (corpus-level paragraphs) and
    remove_repeated_spans (corpus-level n-grams) — this one needs no
    corpus statistics at all.

    Contract (deterministic, oracle-replayable):
    - a LINE is a '\\n'-delimited segment of the original text
      (trailing empties kept, no other splitting);
    - a line is kept iff it is BLANK (empty after ASCII-space trim —
      blank lines are paragraph structure, not content) or it is the
      FIRST occurrence of its exact bytes within the document;
    - kept lines re-join with '\\n' in original order, byte-identical.

    Returns (id, text_clean, n_lines, n_lines_removed). NULL-text
    rows are out of scope.

    Scale: map-only — ONE Project over the scan, no shuffle, no
    state, no Python; runs as-is under Structured Streaming
    (stateless per row). The first-occurrence test is array_position
    inside a filter lambda — O(L^2) per doc in the line count, which
    is page-bounded, never corpus-bounded.

    ``max_lines`` (r13, VERDICT r12 ask #5): the degenerate-page
    guard. A pathological single document with millions of lines (a
    concatenated log dump, a scraper loop) turns the page-bounded
    O(L^2) into a task-stalling quadratic; docs with MORE than
    ``max_lines`` lines therefore pass through UNTOUCHED
    (n_lines_removed=0, n_lines still reported so the skip is
    visible and filterable). The default 100k lines is ~50 MB of
    text at typical line lengths — far beyond any real page, and
    ~10^10 comparisons if quadratic. The test stays a row-local
    size() comparison, so the plan is STILL one codegen Project
    (pinned); None disables the guard."""
    t = F.col(text_col)
    # materialize the line array as a COLUMN before the lambda: an
    # array_position over the derived split EXPRESSION would re-run
    # the split per element (the r11 remove_listed_spans lesson)
    base = (df.where(t.isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("__text"),
                    F.split(t, "\n", -1).alias("__lines")))
    lines = F.col("__lines")
    kept = _kept_lines(lines)
    n_lines = F.size(lines)
    clean = F.array_join(kept, "\n")
    removed = (n_lines - F.size(kept)).cast("bigint")
    if max_lines is not None:
        over = n_lines > int(max_lines)
        clean = F.when(over, F.col("__text")).otherwise(clean)
        removed = F.when(over, F.lit(0).cast("bigint")).otherwise(removed)
    return base.select(
        "id",
        clean.alias("text_clean"),
        n_lines.cast("bigint").alias("n_lines"),
        removed.alias("n_lines_removed"))


def _kept_lines(lines: F.Column) -> F.Column:
    """dedup_lines' keep rule over a MATERIALIZED line-array column:
    blank (ASCII-space trim) or first exact-byte occurrence."""
    return F.filter(
        lines,
        lambda x, i: (F.trim(x) == "") |
                     (F.array_position(lines, x) == i + 1))


def dedup_lines_rewrite(df: DataFrame, text_col: str = "text",
                        max_lines: int | None = DEDUP_MAX_LINES
                        ) -> DataFrame:
    """Replace ``text_col`` with its line-deduped form IN PLACE (same
    keep rule as dedup_lines), keeping every other column — the
    composition form curate_corpus uses as its page-cleanup stage.
    NULL text stays NULL; still one map-only Project. ``max_lines``
    is dedup_lines' degenerate-page guard (docs with more lines pass
    through untouched)."""
    d = df.withColumn("__lines", F.split(F.col(text_col), "\n", -1))
    kept = _kept_lines(F.col("__lines"))
    rewritten = F.array_join(kept, "\n")
    if max_lines is not None:
        rewritten = (F.when(F.size("__lines") > int(max_lines),
                            F.col(text_col))
                     .otherwise(rewritten))
    return (d.withColumn(
        text_col,
        F.when(F.col(text_col).isNotNull(), rewritten))
        .drop("__lines"))


def phrase_hit_exprs(phrases: list[str],
                     text_col: str = "text") -> list:
    """Per-doc boolean bundle: one Column per FROZEN phrase, true iff
    the lowercased whitespace-word sequence occurs anywhere in the
    doc — shared by the dataset_card boilerplate section and the
    streaming card monitor (one definition, their pinned equality
    cannot drift; the cleaning_signal_exprs convention). Aliased
    __bp0..__bpN in the given phrase order. Phrases tokenize with the
    engine's ASCII whitespace class (_phrase_tokens), so phrase and
    document word semantics agree."""
    t = F.col(text_col)
    out = []
    for i, ph in enumerate(phrases):
        toks = _phrase_tokens(ph, "phrase_hit_exprs")
        # ONE regexp pass over the lowered text — whitespace-delimited
        # word-sequence semantics encoded directly: each token bounded
        # by start/whitespace/end, inter-token gaps are whitespace
        # runs. (An element_at-over-derived-array formulation
        # re-evaluates the array per lookup — O(m^2) per doc; the
        # regexp is one linear scan, and stays a codegen-friendly
        # JVM expression for the card/monitor projections.)
        pat = (r"(^|\s)" + r"\s+".join(re.escape(tk) for tk in toks)
               + r"(\s|$)")
        out.append(F.regexp_like(F.lower(t), F.lit(pat))
                   .alias(f"__bp{i}"))
    return out


def ngram_df_histogram(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_ngram: int = 5) -> DataFrame:
    """The min_df-choosing instrument of the span family (the
    calibration-before-commit pattern of minhash_calibration /
    index_recall): the document-frequency distribution of word
    n-grams as log2 buckets — (bucket_min_df, bucket_max_df,
    n_ngrams, n_doc_ngrams) where a bucket holds the n-grams whose DF
    lands in [2^k, 2^(k+1)) and ``n_doc_ngrams`` sums their DF (the
    doc-occurrence mass a remove_repeated_spans run at min_df <=
    bucket_min_df would act on). Read the histogram, see where
    organic phrase-sharing ends and boilerplate begins, then pick
    min_df. DF-1 n-grams (no cross-doc repetition) are excluded —
    they are the (huge, uninteresting) unique tail.

    Scale: the same distinct (id, 8-byte hash) + ONE bounded
    groupBy(hash) pass as the remover's mining stage, then a
    log-bucket rollup over the (hash, df) frame — no strings ride any
    shuffle."""
    if min_ngram < 2:
        raise ValueError(f"min_ngram must be >= 2, got {min_ngram}")
    n = int(min_ngram)
    t = F.col(text_col)
    base = (df.where(t.isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.regexp_extract_all(t, F.lit(r"\S+"), 0)
                    .alias("__w")))
    m = F.size("__w")
    idx = F.explode(F.sequence(F.lit(0), m - n))
    gram = F.lower(F.concat_ws(
        " ", *[F.element_at("__w", F.col("__i") + j + 1)
               for j in range(n)]))
    dfc = (base.where(m >= n)
           .select("id", idx.alias("__i"), "__w")
           .select("id", F.pmod(H.token_hash(gram),
                                F.lit(H.MERSENNE_P)).alias("__sh"))
           .distinct()
           .groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
           .where(F.col("__df") >= 2))
    bucket = F.floor(F.log2(F.col("__df"))).cast("int")
    return (dfc.groupBy(bucket.alias("__b"))
            .agg(F.count(F.lit(1)).alias("n_ngrams"),
                 F.sum("__df").alias("n_doc_ngrams"))
            .select(F.pow(F.lit(2.0), F.col("__b")).cast("bigint")
                    .alias("bucket_min_df"),
                    (F.pow(F.lit(2.0), F.col("__b") + 1)
                     .cast("bigint") - 1).alias("bucket_max_df"),
                    "n_ngrams", "n_doc_ngrams"))
