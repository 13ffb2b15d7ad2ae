"""Round-9 hardening tests: crash-safe generational compaction (kept
live epochs are copied, never the only on-disk copy — ADVICE r8
medium), codes.old self-healing in append/search/stats paths (ADVICE r8
low #2), the single-job hamming_calibration sample (ADVICE r8 low #3),
the grouped-matrix group-cardinality budget (VERDICT r9 ask #1), the
rebuild_index geometry override (ask #2), the single-pass dataset-card
default flip (ask #3), the index-I/O filesystem shim (ask #5), and the
mixed-modality media card (ask #7)."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _parquet_files(root: str) -> int:
    return sum(len([f for f in fs if f.endswith(".parquet")])
               for _, _, fs in os.walk(root))


# ------------------------------------------------------------ compaction
# crash safety (ADVICE r8 medium + low #2)

def _pq_with_appends(spark, tmp_path, name="pq"):
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    idx = str(tmp_path / name)
    S.write_pq_index(a, idx)
    S.append_pq_index(b1, idx)
    S.append_pq_index(b2, idx)
    return emb, idx


def test_generational_compact_crash_between_swap_renames(
        spark, tmp_path, monkeypatch):
    """ADVICE r8 medium: a crash between the two swap renames of a
    GENERATIONAL compaction (keep_epochs_from set) must not lose the
    kept live epochs. Kept epochs are COPIED into the staging tree, so
    codes.old retains them; the recovery path restores the complete
    old tree and a re-run reproduces exactly the pre-crash searches."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb, idx = _pq_with_appends(spark, tmp_path)
    before = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    n_vec = spark.read.parquet(os.path.join(idx, "codes")).count()
    codes_dir = os.path.join(idx, "codes")

    real_rename = os.rename

    def crashing_rename(src, dst):
        if src.endswith(".compact.tmp") and dst == codes_dir:
            raise OSError("simulated crash between the two swap renames")
        real_rename(src, dst)

    monkeypatch.setattr("os.rename", crashing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        S.compact_index(spark, idx, target_files=2, keep_epochs_from=1)
    monkeypatch.setattr("os.rename", real_rename)

    # the crash window: codes missing, codes.old complete (INCLUDING the
    # kept epoch — the old rename-based staging would have moved its
    # only copy into tmp, which the next run rmtree's)
    assert not os.path.isdir(codes_dir)
    assert os.path.isdir(codes_dir + ".old")
    kept_in_old = os.path.isdir(
        os.path.join(codes_dir + ".old", "epoch=1"))
    assert kept_in_old, "kept live epoch must survive in codes.old"

    r = S.compact_index(spark, idx, target_files=2, keep_epochs_from=1)
    assert r["n_epochs_before"] == 3
    assert sorted(S._codes_epochs(idx)) == [-1, 1]
    assert spark.read.parquet(codes_dir).count() == n_vec
    after = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    assert after == before


def test_append_and_search_self_heal_from_codes_old(spark, tmp_path):
    """ADVICE r8 low #2: if 'codes' is missing but 'codes.old' exists
    (death between the swap renames), the FIRST touch — append, search,
    or stats, not only compact_index — restores the old tree. Without
    this, an append would recreate codes holding only its own epoch and
    a later compact would rmtree codes.old, dropping the base codes."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "heal")
    S.write_pq_index(a, idx)
    codes = os.path.join(idx, "codes")

    # search path self-heals
    os.rename(codes, codes + ".old")
    got = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    assert os.path.isdir(codes) and not os.path.isdir(codes + ".old")
    assert got == sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))

    # append path self-heals: the base epoch must still be there after
    os.rename(codes, codes + ".old")
    S.append_pq_index(b, idx)
    assert sorted(S._codes_epochs(idx)) == [-1, 0]
    assert spark.read.parquet(codes).count() == emb.count()

    # stats path self-heals
    os.rename(codes, codes + ".old")
    m = {x["metric"]: x["value"] for x in S.index_stats(spark, idx).collect()}
    assert int(m["n_vectors"]) == emb.count()
    assert not os.path.isdir(codes + ".old")


def test_ivf_search_self_heals_from_codes_old(spark, tmp_path):
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx = str(tmp_path / "ivfheal")
    S.write_ivf_pq_index(emb, idx)
    before = sorted(map(tuple, S.ivf_pq_index_topk(emb, idx).collect()))
    codes = os.path.join(idx, "codes")
    os.rename(codes, codes + ".old")
    after = sorted(map(tuple, S.ivf_pq_index_topk(emb, idx).collect()))
    assert after == before
    assert os.path.isdir(codes) and not os.path.isdir(codes + ".old")


# ------------------------------------------------ hamming_calibration
# single-job sample (ADVICE r8 low #3)

def test_hamming_calibration_tied_ids_single_materialized_sample(spark):
    """ADVICE r8 low #3: with duplicate/tied ids, orderBy(id).limit(n)
    is not a stable selection — evaluated in two independent jobs it
    can hand ground truth and the funnel DIFFERENT rows, making
    n_found exceed n_true (recall > 1). The sample is now collected
    ONCE and both sides read the same materialized rows, so (a) every
    found pair has a ground-truth counterpart (found <= true per
    distance, recall <= 1 — guaranteed, not probabilistic), and (b)
    repeated calls are row-identical."""
    from flink_descriptive_stats_spark.operators import multimodal as M
    # every id appears twice with DIFFERENT phashes, and max_sample
    # cuts mid-tie — the maximally ambiguous selection
    rows = []
    for i in range(64):
        rows.append((i, i * 0x9E3779B97F4A7C15 & 0x7FFFFFFFFFFFFFFF))
        rows.append((i, (i * 0x9E3779B97F4A7C15 + 7)
                     & 0x7FFFFFFFFFFFFFFF))
    hs = spark.createDataFrame(rows, "id bigint, phash bigint") \
        .repartition(8)
    runs = [sorted(map(tuple, M.hamming_calibration(
        hs, max_hamming=6, n_bands="auto", max_sample=101).collect()))
        for _ in range(2)]
    assert runs[0] == runs[1]
    for d, n_true, n_found, recall in runs[0]:
        assert n_found <= n_true, (d, n_true, n_found)
        if recall is not None:
            assert float(recall) <= 1.0, (d, recall)


# -------------------------------------------------- grouped-matrix group
# budget (VERDICT r9 ask #1)

def test_grouped_matrix_group_budget_error_contract(spark):
    """VERDICT r9 ask #1: the grouped matrices drove a driver-side
    groups x pairs materialization with no bound on groups — fine for
    segment keys, catastrophic for grouped_correlation(df, "user_id",
    250 cols). A cheap bounded distinct probe now raises a clear error
    BEFORE any matrix work; explicit max_groups overrides the auto
    budget in both directions; existing segment-key calls unchanged."""
    from flink_descriptive_stats_spark.operators import extras as X
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    cols = ["value", "user_id"]
    # user-scale key + tight explicit budget -> clear error, no jobs
    with pytest.raises(ValueError, match="grouped_correlation.*coarser"):
        X.grouped_correlation(ev, "event_id", columns=cols, max_groups=8)
    with pytest.raises(ValueError, match="grouped_covariance"):
        X.grouped_covariance(ev, "event_id", columns=cols, max_groups=8)
    with pytest.raises(ValueError, match="grouped_spearman"):
        X.grouped_spearman(ev, "event_id", columns=cols, max_groups=8)
    # segment key under the auto budget: unchanged results
    got = X.grouped_correlation(ev, "event_type", columns=cols)
    assert got.count() > 0
    # explicit generous budget admits what auto would also admit
    got2 = X.grouped_correlation(ev, "event_type", columns=cols,
                                 max_groups=1000)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, got2.collect()))


def test_grouped_matrix_auto_budget_scales_with_pairs(spark):
    """The auto budget divides GROUPED_MATRIX_MAX_CELLS by the pair
    count: a wide call tolerates far fewer groups than a narrow one.
    With 64 columns (2016 pairs) the auto budget is ~992 groups, so a
    >1k-cardinality key must raise while a segment key passes."""
    from flink_descriptive_stats_spark.operators import extras as X
    n, k = 2200, 64
    cols = [f"c{i}" for i in range(k)]
    df = spark.range(n).select(
        F.col("id").alias("g"),
        *[(F.col("id") * (i + 3) % 257).cast("double").alias(c)
          for i, c in enumerate(cols)])
    auto = max(64, X.GROUPED_MATRIX_MAX_CELLS // (k * (k - 1) // 2))
    assert auto < n
    with pytest.raises(ValueError, match="auto budget"):
        X.grouped_correlation(df, "g", columns=cols)
    # the same width with a bounded key is fine
    ok = X.grouped_correlation(
        df.withColumn("g", F.col("g") % 4), "g", columns=cols[:3])
    assert ok.count() == 4 * 3


# ------------------------------------------------- rebuild_index geometry
# override (VERDICT r9 ask #2)

def test_rebuild_index_geometry_override_2x_cells(spark, tmp_path):
    """VERDICT r9 ask #2: corpus growth makes the ORIGINAL geometry the
    problem — every cell k-times overfull is invisible to fill_skew
    while the n_probe/n_cells pruning ratio stops paying. rebuild_index
    now accepts n_cells/m/ksub overriding the sidecar: rebuilding the
    grown corpus at 2x cells equals a FRESH build at the new geometry
    exactly (deterministic training => search equality), halves the
    mean per-cell fill, and atomically rewrites the sidecar."""
    import json
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    small = emb.where(F.col("vec_id") < 100)
    grown = emb.where(F.col("vec_id") >= 100)
    idx = str(tmp_path / "grow")
    S.write_ivf_pq_index(small, idx, n_cells=4)
    S.append_ivf_pq_index(grown, idx)
    mean_before = float({r["metric"]: r["value"] for r in
                         S.index_stats(spark, idx).collect()}["mean_cell"])

    S.rebuild_index(emb, idx, n_cells=8)
    fresh = str(tmp_path / "fresh")
    S.write_ivf_pq_index(emb, fresh, n_cells=8)
    got = sorted(map(tuple, S.ivf_pq_index_topk(emb, idx).collect()))
    ref = sorted(map(tuple, S.ivf_pq_index_topk(emb, fresh).collect()))
    assert got == ref, "rebuild at new geometry == fresh build"

    m = {r["metric"]: r["value"] for r in
         S.index_stats(spark, idx).collect()}
    assert m["n_cells"] == "8"
    assert abs(float(m["mean_cell"]) - mean_before / 2) < 1e-6
    with open(os.path.join(idx, "meta.json")) as f:
        assert len(json.load(f)["cells"]) == 8


def test_rebuild_index_geometry_override_flat_pq(spark, tmp_path):
    """m/ksub overrides work on the flat PQ index too; n_cells there
    raises (cell geometry is an IVF concept, not a silent ignore)."""
    import json
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx = str(tmp_path / "flat")
    S.write_pq_index(emb, idx, m=16, ksub=32)
    with pytest.raises(ValueError, match="IVF"):
        S.rebuild_index(emb, idx, n_cells=8)
    S.rebuild_index(emb, idx, m=8, ksub=16)
    with open(os.path.join(idx, "meta.json")) as f:
        meta = json.load(f)
    assert (meta["m"], meta["ksub"]) == (8, 16)
    fresh = str(tmp_path / "flatfresh")
    S.write_pq_index(emb, fresh, m=8, ksub=16)
    assert sorted(map(tuple, S.pq_index_topk(emb, idx).collect())) == \
        sorted(map(tuple, S.pq_index_topk(emb, fresh).collect()))


# --------------------------------------------------- mixed-modality media
# card (VERDICT r9 ask #7)

def _ppm(seed: str) -> bytearray:
    import hashlib
    px = b"".join(hashlib.md5(f"{seed}{j}".encode()).digest()
                  for j in range(48))          # 16x16x3 = 768 bytes
    return bytearray(b"P6\n16 16\n255\n" + px)


def _wav(seed: str) -> bytearray:
    import hashlib
    import struct
    data = b"".join(hashlib.md5(f"{seed}{j}".encode()).digest()
                    for j in range(48))        # 768 bytes = 384 samples
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return bytearray(
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data)


def test_dataset_card_mixed_modality_auto(spark):
    """VERDICT r9 ask #7: a real multimodal drop mixes images and audio
    in one payload column; media_kind='auto' sniffs the container
    header per row (the same magic bytes the decoders dispatch on),
    splits, and emits one media summary plus per-modality sections —
    each metric equal to what the single-kind card reports on that
    modality's slice alone."""
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators import quality as Q
    rows = []
    for i in range(16):
        if i in (0, 1):
            payload = _ppm("A")                 # image cluster of 2
        elif i <= 5:
            payload = _ppm(f"solo{i}")          # image singletons
        elif i in (6, 7):
            payload = _wav("X")                 # audio cluster of 2
        elif i <= 11:
            payload = _wav(f"clip{i}")          # audio singletons
        elif i <= 13:
            payload = bytearray(b"JFIF not a known container")
        elif i == 14:
            payload = None
        else:
            payload = bytearray(b"BM" + b"\x01" * 30)  # sniffed image,
            #                                            undecodable BMP
        rows.append((i, f"document number {i} with some words",
                     "s0", payload))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, payload binary")
    card = [(r["section"], r["metric"], r["value"]) for r in
            Q.dataset_card(df, payload_col="payload",
                           media_kind="auto").collect()]
    d = {(s, m): v for s, m, v in card}
    assert d[("media", "n_payloads")] == "15"
    assert d[("media", "unrecognized_fraction")] == sig6_py(2 / 15)
    assert d[("media_image", "n_payloads")] == "7"
    assert d[("media_image", "decodable_fraction")] == sig6_py(6 / 7)
    assert d[("media_image", "neardup_cluster_fraction")] == \
        sig6_py(2 / 6)
    assert d[("media_audio", "n_payloads")] == "6"
    assert d[("media_audio", "decodable_fraction")] == sig6_py(1.0)
    assert d[("media_audio", "neardup_cluster_fraction")] == \
        sig6_py(2 / 6)
    # fixed section order: summary, then image, then audio
    secs = [s for s, _, _ in card if s.startswith("media")]
    assert secs == (["media"] * 2 + ["media_image"] * 3
                    + ["media_audio"] * 3)
    # per-modality numbers == the single-kind card on that slice alone
    img_only = df.where(
        (F.col("doc_id") <= 5) | (F.col("doc_id") == 15))
    single = {(r["section"], r["metric"]): r["value"] for r in
              Q.dataset_card(img_only, payload_col="payload",
                             media_kind="image").collect()}
    for m in ("n_payloads", "decodable_fraction",
              "neardup_cluster_fraction"):
        assert single[("media", m)] == d[("media_image", m)], m
    # single-modality cards are untouched by the feature (default kind)
    base = {(r["section"], r["metric"]): r["value"]
            for r in Q.dataset_card(df).collect()}
    assert not [k for k in base if k[0].startswith("media")]


# ------------------------------------------------------ fsio shim (VERDICT
# r9 ask #5): index maintenance I/O off raw POSIX

def test_fsio_local_contract(tmp_path):
    """LocalFS implements the maintenance contract: atomic text write,
    rename, recursive delete (missing-ok), copytree, recursive parquet
    counting, listing."""
    from flink_descriptive_stats_spark.functions import fsio
    fs = fsio.get_fs(str(tmp_path))
    assert isinstance(fs, fsio.LocalFS) and fs.atomic_rename
    d = str(tmp_path / "a" / "b")
    fs.mkdirs(d)
    fs.write_text_atomic(os.path.join(d, "m.json"), '{"k": 1}')
    assert fs.read_text(os.path.join(d, "m.json")) == '{"k": 1}'
    assert not fs.exists(os.path.join(d, "m.json.tmp"))
    for n in ("x.parquet", "y.parquet", "z.txt"):
        fs.write_text_atomic(os.path.join(d, n), "")
    assert fs.count_files(str(tmp_path)) == 2
    assert sorted(fs.listdir(d)) == ["m.json", "x.parquet",
                                     "y.parquet", "z.txt"]
    fs.copytree(d, str(tmp_path / "a" / "c"))
    assert fs.count_files(str(tmp_path)) == 4
    fs.rename(str(tmp_path / "a" / "c"), str(tmp_path / "a" / "d"))
    assert fs.isdir(str(tmp_path / "a" / "d"))
    fs.delete(str(tmp_path / "a" / "d"))
    fs.delete(str(tmp_path / "a" / "d"))     # missing-ok
    assert fs.count_files(str(tmp_path)) == 2
    fs.remove_if_exists(os.path.join(d, "z.txt"))
    fs.remove_if_exists(os.path.join(d, "z.txt"))
    assert fs.count_files(str(tmp_path), suffix=".txt") == 0


def test_fsio_scheme_routing(spark, tmp_path):
    """get_fs: scheme-less -> LocalFS; scheme'd -> HadoopFS from the
    live session; scheme'd without a session is a hard error (never a
    silent POSIX attempt against an s3a:// string). atomic_rename is
    True for file/hdfs and False for the S3 family."""
    from flink_descriptive_stats_spark.functions import fsio
    assert isinstance(fsio.get_fs("/x/y"), fsio.LocalFS)
    with pytest.raises(ValueError, match="scheme"):
        fsio.get_fs("s3a://bucket/key")
    h = fsio.get_fs(f"file://{tmp_path}", spark)
    assert isinstance(h, fsio.HadoopFS) and h.atomic_rename
    from flink_descriptive_stats_spark.functions.fsio import \
        _NON_ATOMIC_SCHEMES
    assert "s3a" in _NON_ATOMIC_SCHEMES and "hdfs" not in \
        _NON_ATOMIC_SCHEMES


def test_fsio_hadoop_contract_on_file_uri(spark, tmp_path):
    """The HadoopFS implementation passes the same contract test as
    LocalFS, driven against file:// URIs through the real
    org.apache.hadoop.fs.FileSystem the session would use for HDFS/S3."""
    from flink_descriptive_stats_spark.functions import fsio
    root = f"file://{tmp_path}"
    fs = fsio.get_fs(root, spark)
    d = f"{root}/a/b"
    fs.mkdirs(d)
    fs.write_text_atomic(f"{d}/m.json", '{"k": 1}')
    assert fs.read_text(f"{d}/m.json") == '{"k": 1}'
    for n in ("x.parquet", "y.parquet"):
        fs.write_text_atomic(f"{d}/{n}", "")
    assert fs.count_files(root) == 2
    assert sorted(fs.listdir(d)) == ["m.json", "x.parquet", "y.parquet"]
    fs.copytree(d, f"{root}/a/c")
    assert fs.count_files(root) == 4
    fs.rename(f"{root}/a/c", f"{root}/a/d")
    assert fs.isdir(f"{root}/a/d") and not fs.exists(f"{root}/a/c")
    fs.delete(f"{root}/a/d")
    fs.delete(f"{root}/a/d")                  # missing-ok
    assert fs.count_files(root) == 2
    fs.remove_if_exists(f"{d}/m.json")
    assert not fs.exists(f"{d}/m.json")


def test_index_lifecycle_through_file_uri(spark, tmp_path):
    """End to end through the shim on a scheme'd path: build, append,
    crash-window self-heal, generational compact, stats — every
    maintenance step against file:// URIs, i.e. the exact code path an
    HDFS-resident index takes (only the connector class differs)."""
    from flink_descriptive_stats_spark.functions import fsio
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    idx = f"file://{tmp_path}/pq_uri"
    S.write_pq_index(a, idx)
    S.append_pq_index(b1, idx)
    S.append_pq_index(b2, idx)
    before = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    assert sorted(S._codes_epochs(idx, fsio.get_fs(idx, spark))) == \
        [-1, 0, 1]
    # crash-window: codes.old present, codes missing -> search self-heals
    fs = fsio.get_fs(idx, spark)
    fs.rename(f"{idx}/codes", f"{idx}/codes.old")
    healed = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    assert healed == before
    r = S.compact_index(spark, idx, target_files=2, keep_epochs_from=1)
    assert r["n_epochs_before"] == 3
    # at fixture scale each epoch is one file, so the generational fold
    # pins epoch-count shrink (3 -> base + 1 kept), not a file drop
    assert r["n_files_after"] <= r["n_files_before"]
    assert sorted(S._codes_epochs(idx, fs)) == [-1, 1]
    after = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    assert after == before
    m = {x["metric"]: x["value"]
         for x in S.index_stats(spark, idx).collect()}
    assert int(m["n_vectors"]) == emb.count()
    assert m["n_epochs"] == "2"


# --------------------------------------------- single-scan mixed media
# fingerprints + media_dedup_corpus(kind="auto")

def test_media_fingerprints_match_single_kind_passes(spark):
    """media_fingerprints (one Arrow pass over a mixed column) produces
    byte-identical hashes to the single-kind kernels on each sniffed
    slice, classifies unknown containers and NULL payloads as
    kind='unknown', and keeps the sniffed kind on malformed payloads
    of a recognized container (broken media != not media)."""
    from flink_descriptive_stats_spark.operators import multimodal as M
    rows = [(0, _ppm("A")), (1, _ppm("B")), (2, _wav("X")),
            (3, _wav("Y")), (4, bytearray(b"JFIF junk")), (5, None),
            (6, bytearray(b"BM" + b"\x01" * 30)),        # broken image
            (7, bytearray(b"RIFF\x00\x00\x00\x00WAVExx"))]  # broken wav
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    fp = {r["id"]: (r["kind"], r["decoded"], r["phash"])
          for r in M.media_fingerprints(df).collect()}
    assert fp[4] == ("unknown", False, None)
    assert fp[5] == ("unknown", False, None)
    assert fp[6] == ("image", False, None)
    assert fp[7] == ("audio", False, None)
    img = {r["id"]: r["phash"] for r in M.image_phash(
        df.where(F.col("id").isin(0, 1))).collect()}
    aud = {r["id"]: r["phash"] for r in M.audio_fingerprint(
        df.where(F.col("id").isin(2, 3))).collect()}
    assert (fp[0][2], fp[1][2]) == (img[0], img[1])
    assert (fp[2][2], fp[3][2]) == (aud[2], aud[3])
    assert fp[0][0] == "image" and fp[2][0] == "audio"


def test_media_dedup_corpus_auto_mixed(spark):
    """kind='auto' dedups a MIXED payload column: per-modality funnels
    at their own thresholds, one CC over the union, unknown containers
    kept as singletons; a pure single-kind column through 'auto' keeps
    exactly what the explicit kind keeps."""
    from flink_descriptive_stats_spark.operators import multimodal as M
    rows = [(0, _ppm("A")), (1, _ppm("A")),       # image cluster of 2
            (2, _ppm("Q")),                        # image singleton
            (3, _wav("X")), (4, _wav("X")),        # audio cluster of 2
            (5, _wav("Z")),                        # audio singleton
            (6, bytearray(b"not media at all")),   # unknown: kept
            (7, None)]                             # null payload: dropped
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    keep = sorted(r["id"] for r in M.media_dedup_corpus(
        df.where(F.col("payload").isNotNull()), kind="auto")
        .select("id").collect())
    assert keep == [0, 2, 3, 5, 6]
    # pure-image column: auto == explicit image
    img_only = df.where(F.col("id") <= 2)
    a = sorted(r["id"] for r in M.media_dedup_corpus(
        img_only, kind="auto").select("id").collect())
    b = sorted(r["id"] for r in M.media_dedup_corpus(
        img_only, kind="image").select("id").collect())
    assert a == b == [0, 2]


# ------------------------------------------------- index recall sweep

def test_index_recall_calibration_monotone_and_ceiling(spark, tmp_path):
    """The n_probe recall sweep: recall@k vs exact brute force is
    monotone non-decreasing in n_probe (more cells probed can only add
    candidates to the shortlist) and hits a high ceiling at n_probe =
    n_cells with a generous refine (the exact re-rank then sees nearly
    every true neighbor). The instrument closes the lifecycle metric
    family: fill shape (index_stats) -> quantization error
    (pq_index_calibration) -> what they cost in search quality."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx = str(tmp_path / "ivfrecall")
    S.write_ivf_pq_index(emb, idx, n_cells=8)
    out = {r["n_probe"]: float(r["recall"])
           for r in S.index_recall_calibration(
               emb, idx, k=5, n_probes=(1, 2, 4, 8), refine=16)
           .collect()}
    vals = [out[p] for p in (1, 2, 4, 8)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), vals
    assert vals[-1] >= 0.95, vals
    assert vals[0] <= vals[-1]


def test_index_recall_calibration_flat_pq_raises(spark, tmp_path):
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx = str(tmp_path / "flatrecall")
    S.write_pq_index(emb, idx)
    with pytest.raises(ValueError, match="refine"):
        S.index_recall_calibration(emb, idx)


def test_null_payloads_degrade_never_crash(spark):
    """NULL payloads through every Arrow media kernel degrade to
    decoded=false rows (or metadata-zero rows) instead of TypeError-ing
    the task — previously bytes(None) crashed image_phash /
    audio_fingerprint / image_features / audio_features /
    audio_spectral / image_texture, and media_dedup_corpus on a frame
    with NULL payloads died instead of keeping them as singletons."""
    from flink_descriptive_stats_spark.operators import multimodal as M
    df = spark.createDataFrame(
        [(0, _ppm("A")), (1, None), (2, _wav("X")), (3, None)],
        "id bigint, payload binary")
    assert {r["id"]: r["decoded"] for r in M.image_phash(df).collect()} \
        == {0: True, 1: False, 2: False, 3: False}
    assert {r["id"]: r["decoded"]
            for r in M.audio_fingerprint(df).collect()} \
        == {0: False, 1: False, 2: True, 3: False}
    for fn in (M.image_features, M.audio_features,
               M.image_texture_features, M.audio_spectral_features):
        got = {r["id"]: r["decoded"] for r in fn(df).collect()}
        assert set(got) == {0, 1, 2, 3} and not got[1] and not got[3], fn
    keep = sorted(r["id"] for r in M.media_dedup_corpus(df, kind="auto")
                  .select("id").collect())
    assert keep == [0, 1, 2, 3]   # nothing duplicated; NULLs kept


# ------------------------------------------------ streaming dataset card

def test_streaming_card_monitor_equals_batch(spark, tmp_path):
    """The running dataset card over an unbounded ingest: after N
    micro-batches the sink equals dataset_card on the union — counts,
    source/lang tallies, quality stats, and the EXACT median (token-
    count histogram state, not a sketch) match the batch card row for
    row; the two duplicate fractions ride mergeable HLL sketches and
    match within sketch tolerance under their *_approx names. A
    restart resumes losslessly from the versioned state."""
    from flink_descriptive_stats_spark.operators.quality import \
        dataset_card
    from flink_descriptive_stats_spark.sources.tables import load_table
    from flink_descriptive_stats_spark.streaming.pipeline_stream import \
        start_card_monitor
    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "text", "source")
    chunks = str(tmp_path / "chunks")
    docs.repartition(3).write.parquet(chunks)
    sink = str(tmp_path / "card_sink")
    state = str(tmp_path / "card_state")
    ckpt = str(tmp_path / "card_ckpt")

    def _run(stream):
        q = start_card_monitor(stream, sink, state_path=state,
                               checkpoint_path=ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {(r["section"], r["metric"]): r["value"]
                for r in spark.read.parquet(sink).collect()}

    def _want(df):
        return {(r["section"], r["metric"]): r["value"]
                for r in dataset_card(df).collect()}

    def _check(got, want, n):
        for key, v in want.items():
            if key[1] in ("exact_dup_fraction", "canonical_dup_fraction"):
                gk = (key[0], key[1] + "_approx")
                exact = float(v.replace("e", "E"))
                approx = float(got[gk].replace("e", "E"))
                # HLL default lgConfigK=12: ~2% relative distinct error
                assert abs(approx - exact) <= 0.05, (key, exact, approx)
            else:
                assert got[key] == v, (key, v, got.get(key))
        assert len(got) == len(want)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(chunks))
    _check(_run(stream), _want(docs), docs.count())

    # restart: more documents arrive (some exact duplicates of existing
    # text, stressing the cross-batch dedup sketches and the median)
    more = (docs.limit(120)
            .withColumn("doc_id", F.col("doc_id") + 1000000))
    more.coalesce(1).write.mode("append").parquet(chunks)
    stream2 = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 1).parquet(chunks))
    _check(_run(stream2), _want(docs.unionByName(more)),
           docs.count() + 120)
