"""Round-8 hardening tests: pairwise-complete grouped correlation, the
wide-schema grouped Gram route, index compaction/rebuild (the lifecycle
loop the round-7 drift alarms point at), distributed Bloom construction,
pair-priority BPE encode, Hamming-funnel recall calibration, and the
media section of dataset_card."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.operators import extras as X
from flink_descriptive_stats_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------- grouped
# correlation: pairwise-complete NULLs (ADVICE r7 #1) + gram route
# (VERDICT r7 next-round #5)

def test_grouped_correlation_pairwise_complete_nulls(spark):
    """With NULLs misaligned WITHIN a group, grouped_correlation must be
    Pearson over each pair's pairwise-complete rows (DuckDB corr()
    semantics) — the covar_samp/stddev composition it replaced mixed
    per-column row sets and was not."""
    rows = []
    for i in range(40):
        a = None if i % 5 == 0 else float(i)
        b = None if i % 7 == 0 else float((i * 3) % 11)
        c = float(i * i % 13)
        rows.append(("g1" if i % 2 else "g0", a, b, c))
    df = spark.createDataFrame(
        rows, "grp string, x double, y double, z double")
    got = {(r["group"], r["col_a"], r["col_b"]): r["corr"]
           for r in X.grouped_correlation(
               df, "grp", ["x", "y", "z"]).collect()}
    for g in ("g0", "g1"):
        sub = [r for r in rows if r[0] == g]
        for (ai, an), (bi, bn) in [((1, "x"), (2, "y")), ((1, "x"), (3, "z")),
                                   ((2, "y"), (3, "z"))]:
            pairs = [(r[ai], r[bi]) for r in sub
                     if r[ai] is not None and r[bi] is not None]
            va = np.array([p[0] for p in pairs])
            vb = np.array([p[1] for p in pairs])
            want = np.corrcoef(va, vb)[0, 1]
            assert abs(float(got[(g, an, bn)]) - want) < 1e-6, (g, an, bn)


def test_grouped_correlation_250_columns_gram(spark):
    """The wide-schema grouped case the gram route exists for: 250
    columns x 3 groups (31,125 pairs per group) auto-routes to the
    grouped Gram pass and completes in seconds — the agg alternative
    would re-meet the janino planning cliff per chunk PER GROUP. Every
    (group, pair) is checked against numpy.corrcoef ground truth."""
    n, k = 400, 250
    base = spark.range(n)
    wide = base.select(
        (F.col("id") % 3).cast("string").alias("grp"),
        *[((F.col("id") * (i + 1)) % 257 + (i % 7))
          .cast("double").alias(f"n{i}") for i in range(k)])
    cols = [f"n{i}" for i in range(k)]
    got = {(r["group"], r["col_a"], r["col_b"]): r["corr"]
           for r in X.grouped_correlation(wide, "grp", cols).collect()}
    assert len(got) == 3 * k * (k - 1) // 2
    ids = np.arange(n, dtype=np.float64)
    for g in range(3):
        sel = ids[ids % 3 == g]
        M = np.stack([(sel * (i + 1)) % 257 + (i % 7) for i in range(k)])
        R = np.corrcoef(M)
        for i in range(0, k, 37):           # sampled pairs per group
            for j in range(i + 1, k, 41):
                assert abs(float(got[(str(g), f"n{i}", f"n{j}")])
                           - R[i, j]) < 1e-6, (g, i, j)


def test_grouped_correlation_gram_equals_agg(spark):
    """On NULL-free columns the grouped gram route equals the grouped
    corr()-aggregate route (listwise == pairwise deletion when nothing
    is deleted) to float tolerance — the same two-method contract as
    correlation_matrix, including the NULL-group segment."""
    ev = load_table(spark, SF_DIR, "events")
    cols = ["value", "user_id", "event_id"]
    agg = {(r["group"], r["col_a"], r["col_b"]): r["corr"]
           for r in X.grouped_correlation(
               ev, "event_type", cols, method="agg").collect()}
    gram = {(r["group"], r["col_a"], r["col_b"]): r["corr"]
            for r in X.grouped_correlation(
                ev, "event_type", cols, method="gram").collect()}
    assert set(agg) == set(gram)
    for p in agg:
        if agg[p] is None or gram[p] is None:
            assert agg[p] == gram[p], p
        else:
            assert abs(float(agg[p]) - float(gram[p])) < 1e-6, p


def test_grouped_correlation_gram_null_group_and_constant(spark):
    """The gram route keeps the NULL group as its own segment and maps a
    within-group constant column to NULL corr (never an ANSI error)."""
    rows = [(None, 1.0, 2.0), (None, 2.0, 5.0), (None, 3.0, 7.0),
            ("a", 4.0, 4.0), ("a", 4.0, 9.0), ("a", 4.0, 1.0)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = {(r["group"], r["col_a"], r["col_b"]): r["corr"]
           for r in X.grouped_correlation(
               df, "grp", ["x", "y"], method="gram").collect()}
    assert set(g for g, _, _ in got) == {None, "a"}
    assert got[("a", "x", "y")] is None          # constant x in group a
    va = np.corrcoef([1.0, 2.0, 3.0], [2.0, 5.0, 7.0])[0, 1]
    assert abs(float(got[(None, "x", "y")]) - va) < 1e-6


# ---------------------------------------------------------------- index
# lifecycle: compact + rebuild (VERDICT r7 next-round #1) and the
# pinned-epoch legacy guard (ADVICE r7 #3)

def _flatten_to_legacy(idx: str) -> None:
    """Rewrite an epoch-layout PQ index into the pre-epoch flat layout
    (codes/*.parquet directly) — the migration-source fixture."""
    import shutil
    codes = os.path.join(idx, "codes")
    epoch_dir = os.path.join(codes, "epoch=-1")
    for name in os.listdir(epoch_dir):
        shutil.move(os.path.join(epoch_dir, name),
                    os.path.join(codes, name))
    os.rmdir(epoch_dir)


def _parquet_files(root: str) -> int:
    return sum(len([f for f in fs if f.endswith(".parquet")])
               for _, _, fs in os.walk(root))


def test_compact_index_pq_search_equality_and_file_drop(spark, tmp_path):
    """Compaction is a pure I/O-layout rewrite: after two appends, the
    compacted PQ index searches EXACTLY like the pre-compaction one,
    the epoch count returns to 1, the parquet file count drops, and
    index_stats' append counter resets."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    idx = str(tmp_path / "pq")
    S.write_pq_index(a, idx)
    S.append_pq_index(b1, idx)
    S.append_pq_index(b2, idx)
    before = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    files_before = _parquet_files(os.path.join(idx, "codes"))
    assert len(S._codes_epochs(idx)) == 3
    r = S.compact_index(spark, idx, target_files=2)
    assert r["n_epochs_before"] == 3
    assert r["n_files_after"] < r["n_files_before"] == files_before
    assert S._codes_epochs(idx) == [-1]
    after = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    assert after == before
    m = {x["metric"]: x["value"]
         for x in S.index_stats(spark, idx).collect()}
    assert (m["n_epochs"], m["n_appends"]) == ("1", "0")
    assert int(m["n_vectors"]) == emb.count()


def test_compact_index_ivf_pq_keeps_cell_partitioning(spark, tmp_path):
    """IVF-PQ compaction preserves the cell_id partition layout (the
    probe bound stays a disk bound) and search equality; each cell
    directory collapses to one file."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf")
    S.write_ivf_pq_index(a, idx)
    S.append_ivf_pq_index(b, idx)
    before = sorted(map(tuple, S.ivf_pq_index_topk(emb, idx).collect()))
    r = S.compact_index(spark, idx, target_files=4)
    assert r["n_files_after"] < r["n_files_before"]
    base = os.path.join(idx, "codes", "epoch=-1")
    cell_dirs = [d for d in os.listdir(base) if d.startswith("cell_id=")]
    assert cell_dirs, "cell partitioning must survive compaction"
    for d in cell_dirs:      # hashed-by-cell repartition: 1 file per cell
        assert _parquet_files(os.path.join(base, d)) == 1, d
    after = sorted(map(tuple, S.ivf_pq_index_topk(emb, idx).collect()))
    assert after == before


def test_compact_index_migrates_legacy_layout(spark, tmp_path):
    """Compacting a legacy flat-layout index migrates it into the epoch
    layout (search unchanged), after which pinned-epoch appends — the
    streaming sink's idempotency contract — are honored again."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "legacy")
    S.write_pq_index(a, idx)
    _flatten_to_legacy(idx)
    assert S._codes_epochs(idx) == []
    before = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    S.compact_index(spark, idx, target_files=2)
    assert S._codes_epochs(idx) == [-1]
    assert sorted(map(tuple,
                      S.pq_index_topk(emb, idx).collect())) == before
    S.append_pq_index(b, idx, epoch=7)        # pinned epoch now honored
    assert S._codes_epochs(idx) == [-1, 7]


def test_append_pinned_epoch_on_legacy_layout_raises(spark, tmp_path):
    """ADVICE r7 #3: an EXPLICIT epoch on the legacy flat layout must
    raise (a silent mode('append') fallback would double-append on a
    replayed micro-batch); the unpinned batch append still works."""
    import pytest as _pytest
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "legacy_pin")
    S.write_pq_index(a, idx)
    _flatten_to_legacy(idx)
    with _pytest.raises(ValueError, match="legacy flat code layout"):
        S.append_pq_index(b, idx, epoch=3)
    S.append_pq_index(b, idx)                 # unpinned: plain append OK
    n = spark.read.parquet(os.path.join(idx, "codes")).count()
    assert n == emb.count()


def test_rebuild_index_resets_calibration_to_fresh_build(spark, tmp_path):
    """The alarm-remediation loop closes: a distribution-stretch append
    raises the stored-books ADC error (round-7 fixture); rebuild_index
    retrains on the CURRENT corpus and the calibration rows become
    IDENTICAL to a fresh build on that corpus (deterministic training),
    i.e. the error returns exactly to fresh-build level."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "drift")
    S.write_ivf_pq_index(a, idx)

    def err(path, corpus):
        rows = S.pq_index_calibration(corpus, path).collect()
        return sum(float(r["mean_abs_err"]) for r in rows) / len(rows)

    err0 = err(idx, a)
    stretched = b.withColumn("embedding", F.expr(
        "transform(embedding, (x, i) -> "
        "CASE WHEN i % 2 = 1 THEN x * 5.0 ELSE x END)"))
    S.append_ivf_pq_index(stretched, idx)
    union = a.unionByName(stretched)
    err1 = err(idx, union)
    assert err1 > err0, (err0, err1)
    S.rebuild_index(union, idx)
    fresh = str(tmp_path / "fresh")
    S.write_ivf_pq_index(union, fresh)
    got = sorted(map(tuple, S.pq_index_calibration(union, idx).collect()))
    want = sorted(map(tuple,
                      S.pq_index_calibration(union, fresh).collect()))
    assert got == want                         # exactly fresh-build level
    err2 = err(idx, union)
    assert err2 < err1, (err2, err1)
    # geometry preserved from the sidecar; appends folded, epochs reset
    assert S._codes_epochs(idx) == [-1]
    m = {x["metric"]: x["value"]
         for x in S.index_stats(spark, idx).collect()}
    assert int(m["n_vectors"]) == union.count()


def test_uncheckpointed_stream_runs_get_fresh_offsets(spark, tmp_path):
    """ADVICE r7 #2: two successive UNCHECKPOINTED stream runs against
    the same index must land in disjoint epoch ranges — the second run
    must not reuse the first's offset (epoch ids restart at 0) and
    silently overwrite its codes."""
    from flink_descriptive_stats_spark.operators import similarity as S
    from flink_descriptive_stats_spark.streaming.pipeline_stream import (
        start_index_append_stream)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    idx = str(tmp_path / "nock")
    S.write_pq_index(a, idx)
    for i, part in enumerate((b1, b2)):
        src = str(tmp_path / f"src{i}")
        part.coalesce(1).write.parquet(src)
        stream = (spark.readStream.schema(emb.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_index_append_stream(stream, idx)   # no checkpoint
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # nothing overwritten: all three populations present, epochs disjoint
    codes = spark.read.parquet(os.path.join(idx, "codes"))
    assert codes.count() == emb.count()
    assert not os.path.exists(os.path.join(idx, "stream_runs.json"))
    assert len(S._codes_epochs(idx)) == 3          # base + one per run


# ---------------------------------------------------------------- bloom:
# distributed construction (VERDICT r7 next-round #2)

def test_bloom_bitset_distributed_equals_driver_built(spark):
    """The distributed Bloom build (per-batch set-word partials OR-merged
    in one bounded aggregate) produces a bitset BIT-IDENTICAL to the
    naive driver-side construction over the collected hashes, and what
    reaches the driver is the words frame — at most m_bits/64 rows,
    never holdout-scale."""
    from flink_descriptive_stats_spark.operators.dedup import (
        _bloom_bitset, _bloom_set_words, _splitmix_probe)
    docs = load_table(spark, SF_DIR, "documents")
    h = (docs.where(F.col("text").isNotNull())
         .select(F.xxhash64(F.col("text")).alias("h"))
         .distinct().repartition(7))          # multi-partition partials
    bloom, m_bits = _bloom_bitset(h, 16, 8)
    hashes = np.array([r["h"] for r in h.collect()],
                      dtype=np.int64).astype(np.uint64)
    ref = np.zeros(m_bits // 64, dtype=np.uint64)
    for i in range(8):
        pos = _splitmix_probe(hashes, i) % np.uint64(m_bits)
        np.bitwise_or.at(ref, (pos // np.uint64(64)).astype(np.int64),
                         np.uint64(1) << (pos % np.uint64(64)))
    assert np.array_equal(bloom, ref)
    assert _bloom_set_words(h, m_bits, 8).count() <= m_bits // 64
    # empty holdout: a well-formed all-zero minimum-size bitset
    empty, me = _bloom_bitset(h.limit(0), 16, 8)
    assert me == 64 and not empty.any()


# ---------------------------------------------------------------- BPE:
# pair-priority encode (VERDICT r7 next-round #4)

def test_bpe_pair_priority_encode_matches_mirror_at_1k_merges(spark):
    """The pair-priority encode (lowest-rank pair first, table-size-
    independent per word) equals the rank-by-rank mirror on a LEARNED
    >= 1k-merge table — the equivalence the production encode relies on
    (a merge's output symbol only appears in later-rank pairs), pinned
    at the table size where the old O(n_merges x len) loop hurt."""
    from flink_descriptive_stats_spark.operators.text import (
        _bpe_merge_loop, bpe_token_stats)
    import hashlib
    words = ["".join(chr(97 + b % 26)
                     for b in hashlib.md5(str(i).encode()).digest()
                     [:5 + i % 9]) for i in range(600)]
    wc = [(w, 1 + (i % 17)) for i, w in enumerate(words)]
    full = _bpe_merge_loop(wc, 1200)
    assert len(full) >= 1000, len(full)
    merges = [(left, right) for _, left, right, _, _ in full[:1000]]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i::37])) for i in range(37)],
        "doc_id bigint, text string")
    got = {r["id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_token_stats(docs, merges=merges).collect()}
    for i in range(37):
        ws = words[i::37]
        total = 0
        for w in ws:
            s = list(w) + ["</w>"]
            for a, b in merges:            # the rank-by-rank mirror
                out, j = [], 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                s = out
            total += len(s)
        assert got[i] == (len(ws), total), i


# ---------------------------------------------------------------- hamming
# funnel recall calibration (VERDICT r7 next-round #6, ADVICE r7 #4)

def _h64(s):
    import hashlib
    v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def _flip(v, bits):
    u = v & ((1 << 64) - 1)
    for b in bits:
        u ^= (1 << b)
    return u - (1 << 64) if u >= (1 << 63) else u


def _calibration_fixture(spark):
    """300 base codes + one perturbed copy each: d=2 in-band (found by
    any geometry), d=4 one-flip-per-band (adversarial for 4 bands),
    d=4 in-band (friendly). Cross-pair distances are ~32 bits."""
    rows, idc = [], 0
    for tag, bits in (("A", [0, 1]), ("B", [8, 24, 40, 56]),
                      ("C", [1, 2, 3, 4])):
        for i in range(100):
            v = _h64(f"{tag}{i}")
            rows += [(idc, v), (idc + 1, _flip(v, bits))]
            idc += 2
    return spark.createDataFrame(rows, "id bigint, phash bigint")


def test_hamming_calibration_pigeonhole_and_measured_drop(spark):
    """At 4 bands: recall == 1.0 for d <= n_bands-1 (pigeonhole), and
    the d=4 row shows the measured drop (the friendly half found, the
    spread-across-every-band half missed) — the cost an operator tuning
    max_hamming past the pigeonhole bound must see."""
    from flink_descriptive_stats_spark.operators import multimodal as M
    hs = _calibration_fixture(spark)
    cal = {r["hamming"]: r
           for r in M.hamming_calibration(hs, max_hamming=6).collect()}
    assert set(cal) == set(range(7))
    r2 = cal[2]
    assert r2["n_true_pairs"] == 100 == r2["n_found_pairs"]
    assert float(r2["recall"]) == 1.0
    r4 = cal[4]
    assert r4["n_true_pairs"] == 200
    assert r4["n_found_pairs"] == 100          # only the in-band half
    assert float(r4["recall"]) == 0.5
    assert cal[5]["n_true_pairs"] == 0 and cal[5]["recall"] is None


def test_hamming_calibration_full_recall_at_enough_bands(spark):
    """n_bands >= max_hamming + 1 restores guaranteed recall: at 8
    bands the same adversarial d=4 pairs are all found (at most 4 of 8
    bands touched -> some band agrees) — the remediation the CLI help
    points at."""
    from flink_descriptive_stats_spark.operators import multimodal as M
    hs = _calibration_fixture(spark)
    cal = {r["hamming"]: r
           for r in M.hamming_calibration(hs, max_hamming=6,
                                          n_bands=8).collect()}
    for d in (2, 4):
        assert cal[d]["n_found_pairs"] == cal[d]["n_true_pairs"], d
        assert float(cal[d]["recall"]) == 1.0


# ---------------------------------------------------------------- dataset
# card: media section (VERDICT r7 next-round #7)

def test_dataset_card_media_section(spark):
    """With a payload column named, the card appends the media section:
    exact n_payloads, sig6 decodable_fraction, and the near-dup cluster
    mass (share of decodable payloads in a pHash cluster of size >= 2).
    Without payload_col the card is byte-identical to before — the
    gated oracle surface is untouched."""
    import hashlib
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators import quality as Q

    def ppm(seed):
        px = b"".join(hashlib.md5(f"{seed}{j}".encode()).digest()
                      for j in range(48))     # 16x16x3 = 768 bytes
        return bytearray(b"P6\n16 16\n255\n" + px)

    rows = []
    for i in range(12):
        if i in (0, 1):
            payload = ppm("A")                # cluster of 2
        elif i in (2, 3, 4):
            payload = ppm("B")                # cluster of 3
        elif i in (5, 6, 7, 8):
            payload = ppm(f"solo{i}")         # singletons
        elif i in (9, 10):
            payload = bytearray(b"JFIF not decodable")
        else:
            payload = None
        rows.append((i, f"document number {i} with some words",
                     "s0", payload))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, payload binary")
    card = {(r["section"], r["metric"]): r["value"]
            for r in Q.dataset_card(df, payload_col="payload").collect()}
    assert card[("media", "n_payloads")] == "11"
    assert card[("media", "decodable_fraction")] == sig6_py(9 / 11)
    assert card[("media", "neardup_cluster_fraction")] == sig6_py(5 / 9)
    plain = {(r["section"], r["metric"]): r["value"]
             for r in Q.dataset_card(df).collect()}
    assert not [k for k in plain if k[0] == "media"]
    assert plain == {k: v for k, v in card.items() if k[0] != "media"}


# ---------------------------------------------------------------- grouped
# covariance (r8 sibling of the grouped-correlation family)

def test_grouped_covariance_gram_equals_agg_and_numpy(spark):
    """grouped_covariance's two routes agree on NULL-free columns, and
    the agg route matches numpy.cov per group on a constructed frame."""
    ev = load_table(spark, SF_DIR, "events")
    cols = ["value", "user_id", "event_id"]
    agg = {(r["group"], r["col_a"], r["col_b"]): r["cov"]
           for r in X.grouped_covariance(
               ev, "event_type", cols, method="agg").collect()}
    gram = {(r["group"], r["col_a"], r["col_b"]): r["cov"]
            for r in X.grouped_covariance(
                ev, "event_type", cols, method="gram").collect()}
    assert set(agg) == set(gram)
    for p in agg:
        if agg[p] is None or gram[p] is None:
            assert agg[p] == gram[p], p
        else:
            ra, rg = float(agg[p]), float(gram[p])
            assert abs(ra - rg) <= 1e-6 * max(1.0, abs(ra)), p
    rows = [("g0" if i % 2 else "g1", float(i), float((i * 3) % 11))
            for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = {r["group"]: r["cov"]
           for r in X.grouped_covariance(df, "grp", ["x", "y"]).collect()}
    for g in ("g0", "g1"):
        xs = np.array([r[1] for r in rows if r[0] == g])
        ys = np.array([r[2] for r in rows if r[0] == g])
        want = np.cov(xs, ys, ddof=1)[0, 1]
        from flink_descriptive_stats_spark.functions.sig import sig6_py
        assert got[g] == sig6_py(want), g


def test_auto_bands_geometry_and_full_recall(spark):
    """n_bands='auto' resolves to the smallest 64-divisor >= mh+1 and
    restores guaranteed recall on the adversarial fixture; out-of-range
    thresholds raise."""
    from flink_descriptive_stats_spark.operators import multimodal as M
    assert [M.auto_bands(h) for h in (0, 1, 3, 6, 7, 8, 15, 31, 63)] \
        == [1, 2, 4, 8, 8, 16, 16, 32, 64]
    with pytest.raises(ValueError):
        M.auto_bands(64)
    hs = _calibration_fixture(spark)
    cal = {r["hamming"]: r
           for r in M.hamming_calibration(hs, max_hamming=6,
                                          n_bands="auto").collect()}
    for d in (2, 4):
        assert float(cal[d]["recall"]) == 1.0, d


def test_streaming_index_append_generational_compaction(spark, tmp_path):
    """compact_every bounds the epoch-dir debt INSIDE the sink: driving
    the emitter through 4 micro-batches with compact_every=2, the epoch
    count stays O(bound) instead of one dir per batch, nothing is lost
    or double-counted (count == union after every batch), a replay of
    the LAST batch (kept out of the fold) is still a no-op, and search
    equals the plain batch-append reference."""
    from flink_descriptive_stats_spark.operators import similarity as S
    from flink_descriptive_stats_spark.streaming.pipeline_stream import (
        _index_append_emitter)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 5 == 0)
    parts = [emb.where(F.col("vec_id") % 5 == k) for k in (1, 2, 3, 4)]
    idx = str(tmp_path / "gen")
    S.write_pq_index(a, idx)
    ref = str(tmp_path / "ref")
    S.write_pq_index(a, ref)
    emit = _index_append_emitter(idx, offset=0, compact_every=2)
    running = a.count()
    for n, part in enumerate(parts):
        emit(part, n)
        S.append_pq_index(part, ref)
        running += part.count()
        codes = spark.read.parquet(os.path.join(idx, "codes"))
        assert codes.count() == running, n
        assert len(S._codes_epochs(idx)) <= 3, n   # base + <= bound
    n_epochs = len(S._codes_epochs(idx))
    emit(parts[-1], 3)                             # replay the last batch
    assert spark.read.parquet(os.path.join(idx, "codes")).count() \
        == running
    assert len(S._codes_epochs(idx)) == n_epochs
    got = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    want = sorted(map(tuple, S.pq_index_topk(emb, ref).collect()))
    assert got == want


def test_compact_index_recovers_from_crash_window(spark, tmp_path):
    """A crash between the two swap renames leaves codes.old complete
    and codes missing; the next compact_index restores it and proceeds
    — search results identical to the never-crashed path."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "crash")
    S.write_pq_index(a, idx)
    S.append_pq_index(b, idx)
    before = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    codes = os.path.join(idx, "codes")
    os.rename(codes, codes + ".old")               # the crash window
    r = S.compact_index(spark, idx, target_files=2)
    assert r["n_epochs_before"] == 2
    assert S._codes_epochs(idx) == [-1]
    assert not os.path.exists(codes + ".old")
    assert sorted(map(tuple,
                      S.pq_index_topk(emb, idx).collect())) == before


def test_grouped_spearman_exact_vs_pandas_and_approx_agreement(spark):
    """Exact grouped Spearman equals pandas average-rank ground truth
    per group (incl. ties); the approx global-cutpoint path agrees
    within tolerance on the events fixture (monotone transform: global
    monotonicity implies within-group monotonicity)."""
    import pandas as pd
    rows = [("g0" if i % 2 else "g1",
             float(i % 7),                      # ties within groups
             float((i * i) % 23),
             float((i * 3) % 11)) for i in range(60)]
    df = spark.createDataFrame(
        rows, "grp string, x double, y double, z double")
    got = {(r["group"], r["col_a"], r["col_b"]): r["rho"]
           for r in X.grouped_spearman(
               df, "grp", ["x", "y", "z"]).collect()}
    pdf = pd.DataFrame(rows, columns=["grp", "x", "y", "z"])
    for g, sub in pdf.groupby("grp"):
        rk = sub[["x", "y", "z"]].rank(method="average")
        for a, b in (("x", "y"), ("x", "z"), ("y", "z")):
            want = np.corrcoef(rk[a], rk[b])[0, 1]
            assert abs(float(got[(g, a, b)]) - want) < 1e-6, (g, a, b)
    ev = load_table(spark, SF_DIR, "events")
    cols = ["event_id", "user_id", "value"]
    exact = {(r["group"], r["col_a"], r["col_b"]): float(r["rho"])
             for r in X.grouped_spearman(
                 ev, "event_type", cols).collect()}
    approx = {(r["group"], r["col_a"], r["col_b"]): float(r["rho"])
              for r in X.grouped_spearman(
                  ev, "event_type", cols, exact=False).collect()}
    assert set(exact) == set(approx)
    for p in exact:
        assert abs(exact[p] - approx[p]) < 0.08, (p, exact[p], approx[p])


def test_grouped_spearman_approx_plan_has_no_window_or_sort(spark):
    """The approx grouped-Spearman path must stay window/sort-free end
    to end except the bounded grouped aggregate — the same plan pin the
    global approx Spearman carries (the whole point of the surrogate is
    no per-column sorting)."""
    ev = load_table(spark, SF_DIR, "events")
    ranked_plus_agg = X.grouped_spearman(
        ev, "event_type", ["event_id", "user_id", "value"], exact=False)
    # the output frame is driver-assembled; pin the upstream rank frame
    # instead: rebuild it the way grouped_spearman does
    from pyspark.sql import functions as F2
    base = (ev.select(F2.col("event_type").alias("__g"),
                      "event_id", "user_id", "value")
            .dropna(subset=["event_id", "user_id", "value"]))
    probs = F2.array(*[F2.lit((i + 1) / 200) for i in range(199)])
    cuts = base.agg(*[
        F2.percentile_approx(F2.col(c).cast("double"), probs).alias(c)
        for c in ["event_id", "user_id", "value"]]).collect()[0]
    ranked = base.select("__g", *[
        X._cut_index_expr(f"CAST(`{c}` AS DOUBLE)", cuts[c]).alias(c)
        for c in ["event_id", "user_id", "value"]])
    plan = ranked._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "Window" not in plan and "Sort" not in plan
    assert len(ranked_plus_agg.columns) == 4     # end-to-end still runs


def test_dataset_card_single_pass_equals_default(spark):
    """The single-pass card (one corpus scan + one global agg + one
    bounded (source, lang) groupBy over the cached narrow frame) equals
    the five-scan audit path row for row — including with the media
    section — and its per-doc projection is a pure narrow select (no
    Join, no Exchange). Since r9 single_pass=True IS the default (the
    100 TB plan is what a naive caller gets), so the DEFAULT call is
    compared against the explicit five-pass audit path."""
    from flink_descriptive_stats_spark.operators import quality as Q
    docs = load_table(spark, SF01, "documents")
    five_pass = [tuple(r) for r in Q.dataset_card(
        docs, single_pass=False).collect()]
    default = [tuple(r) for r in Q.dataset_card(docs).collect()]
    assert default == five_pass
    # approx-median variant rides the same switch
    da = [tuple(r) for r in Q.dataset_card(docs, exact=False).collect()]
    fa = [tuple(r) for r in Q.dataset_card(
        docs, exact=False, single_pass=False).collect()]
    assert da == fa
    # plan pin on the combined per-doc projection
    from flink_descriptive_stats_spark.operators.dedup import \
        _canonical_expr
    from flink_descriptive_stats_spark.operators.text import (
        _lang_scores, _predicted_lang_expr, pii_exprs, text_stats_exprs)
    c = F.col("text")
    per = (docs.where(c.isNotNull())
           .select(F.md5(c).alias("__h"),
                   F.md5(_canonical_expr("text")).alias("__hc"),
                   F.col("source").alias("__src"),
                   _predicted_lang_expr(_lang_scores(c)).alias("__lang"),
                   *text_stats_exprs("text"), *pii_exprs("text")))
    plan = per._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "Join" not in plan and "Exchange" not in plan


def test_dataset_card_by_source_single_pass_equals_default(spark):
    """The single-pass per-source card (no per-doc joins: source rides
    the one combined projection) is the r9 DEFAULT and equals the
    join-based audit path row for row."""
    from flink_descriptive_stats_spark.operators import quality as Q
    docs = load_table(spark, SF01, "documents")
    default = [tuple(r)
               for r in Q.dataset_card_by_source(docs).collect()]
    join_based = [tuple(r) for r in Q.dataset_card_by_source(
        docs, single_pass=False).collect()]
    assert default == join_based


# ---------------------------------------------------------------- property
# tests (hypothesis): round-8 primitives

def test_auto_bands_properties():
    """For every legal threshold: the result divides 64, gives >=
    max_hamming+1 bands (pigeonhole guarantee), and is the SMALLEST
    such divisor (band width maximal => bucket keyspace maximal)."""
    from flink_descriptive_stats_spark.operators.multimodal import \
        auto_bands
    divisors = [1, 2, 4, 8, 16, 32, 64]
    for mh in range(64):
        b = auto_bands(mh)
        assert b in divisors and 64 % b == 0
        assert b >= mh + 1
        smaller = [d for d in divisors if d < b]
        assert all(d < mh + 1 for d in smaller), (mh, b)


def test_bpe_pair_priority_equivalence_property():
    """Hypothesis: for random words and random learned merge tables,
    pair-priority encoding == rank-by-rank application (the equivalence
    the production encode relies on), without Spark in the loop."""
    from hypothesis import given, settings, strategies as st

    def rank_by_rank(word, merges):
        s = list(word) + ["</w>"]
        for a, b in merges:
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s = out
        return len(s)

    def pair_priority(word, merges):
        ranks = {tuple(p): r for r, p in enumerate(merges)}
        sym = list(word) + ["</w>"]
        while len(sym) > 1:
            best = None
            for p in zip(sym, sym[1:]):
                r = ranks.get(p)
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            left, right = merges[best]
            out, j = [], 0
            while j < len(sym):
                if (j + 1 < len(sym) and sym[j] == left
                        and sym[j + 1] == right):
                    out.append(left + right)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            sym = out
        return len(sym)

    from flink_descriptive_stats_spark.operators.text import \
        _bpe_merge_loop

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=8),
                    min_size=1, max_size=20),
           st.integers(min_value=1, max_value=40))
    def check(words, n_merges):
        wc = [(w, i + 1) for i, w in enumerate(words)]
        merges = [(left, right)
                  for _, left, right, _, _ in _bpe_merge_loop(wc, n_merges)]
        for w in words:
            assert pair_priority(w, merges) == rank_by_rank(w, merges), \
                (w, merges)

    check()


def test_hamming_calibration_md5_query_structure(spark):
    """The oracle-gated md5-signature calibration query shows the
    intended structure at fixture scale: every base/copy pair at d=2
    (doc_id%3==0 -> 2 in-band flips) is found; the d=4 population is
    split between the in-band half (found) and the one-flip-per-band
    half (missed) -> recall strictly between 0 and 1."""
    import __spark_entry__ as m
    rows = {r["hamming"]: r
            for r in m.queries()["hamming_calibration_md5_documents"](
                spark, SF_DIR).collect()}
    assert set(rows) == set(range(7))
    assert rows[2]["n_true_pairs"] > 0
    assert rows[2]["n_found_pairs"] == rows[2]["n_true_pairs"]
    assert float(rows[2]["recall"]) == 1.0
    assert rows[4]["n_true_pairs"] > rows[4]["n_found_pairs"] > 0
    assert 0.0 < float(rows[4]["recall"]) < 1.0


def test_compact_index_edge_paths(spark, tmp_path):
    """Edges of the lifecycle ops: compacting a base-only index (no
    appends) still searches identically; a generational fold whose
    threshold is below every epoch is a no-op; rebuild works for the
    flat-PQ kind too (geometry preserved from the sidecar)."""
    import json
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx = str(tmp_path / "baseonly")
    S.write_pq_index(emb, idx, m=8, ksub=16)
    before = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    r = S.compact_index(spark, idx, target_files=2)
    assert r["n_epochs_before"] == 1 and S._codes_epochs(idx) == [-1]
    assert sorted(map(tuple,
                      S.pq_index_topk(emb, idx).collect())) == before
    # generational no-op: every epoch >= threshold stays untouched
    r2 = S.compact_index(spark, idx, keep_epochs_from=-1)
    assert r2["n_files_after"] == r2["n_files_before"]
    # PQ rebuild preserves declared geometry
    S.rebuild_index(emb, idx)
    with open(os.path.join(idx, "meta.json")) as f:
        meta = json.load(f)
    assert (meta["m"], meta["ksub"]) == (8, 16)
    assert sorted(map(tuple,
                      S.pq_index_topk(emb, idx).collect())) == before
