"""Dedup / similarity / text / multimodal operator semantics on hand-built
fixtures with independently computed expectations."""

import pytest
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.operators import (dedup, multimodal,
                                                     similarity)
from flink_descriptive_stats_spark.operators import text as text_ops

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "completely different content about spark engines and data"),
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (4, "pack my box with five dozen liquor jugs"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    rows = {r["rep_id"]: r["dup_count"]
            for r in dedup.exact_dedup(docs).collect()}
    assert rows[0] == 2          # docs 0 and 3 identical
    assert rows[1] == 1 and rows[2] == 1 and rows[4] == 1
    assert 3 not in rows         # represented by 0


def test_keep_first(docs):
    kept = sorted(r["doc_id"] for r in dedup.keep_first(docs).collect())
    assert kept == [0, 1, 2, 4]                     # 3 is a dup of 0


@pytest.mark.parametrize("parts", [1, 64])
def test_partitioning_invariance(spark, docs, parts):
    """Results must not depend on input partitioning (the reference's own
    merge bug class — SURVEY.md §2.6 item 2)."""
    d = docs.repartition(parts)
    sigs = sorted(map(tuple, dedup.minhash_signatures(d).collect()))
    assert sigs == sorted(map(tuple, dedup.minhash_signatures(docs).collect()))
    sh = sorted(map(tuple, dedup.simhash_signatures(d).collect()))
    assert sh == sorted(map(tuple, dedup.simhash_signatures(docs).collect()))
    pairs = sorted(map(tuple, dedup.ngram_jaccard_pairs(d).collect()))
    assert pairs == sorted(
        map(tuple, dedup.ngram_jaccard_pairs(docs).collect()))
    stats = sorted(map(tuple, text_ops.text_stats(d).collect()))
    assert stats == sorted(map(tuple, text_ops.text_stats(docs).collect()))


def test_null_text_excluded(spark):
    """Content operators exclude NULL-text rows (mirrored in the oracle's
    tokens CTE) instead of hashing them like empty strings."""
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, None), (3, "")],
        "doc_id long, text string")
    assert {r["id"] for r in dedup.minhash_signatures(df).collect()} == {1, 3}
    assert {r["id"] for r in dedup.simhash_signatures(df).collect()} == {1, 3}
    assert {r["id"] for r in text_ops.fingerprints(df).collect()} == {1, 3}
    assert {r["id"] for r in text_ops.text_stats(df).collect()} == {1, 3}


def test_all_null_column_quantiles_outliers(spark):
    """All-NULL numeric columns: quantiles render NULL, outlier counts are
    0 (SQL count-FILTER semantics), no crash."""
    from flink_descriptive_stats_spark.operators import extras
    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (100.0, None)],
        "a double, b double")
    q = {r["column"]: r for r in extras.quantiles(df).collect()}
    assert q["a"]["q_50"] is not None and q["b"]["q_50"] is None
    o = {r["column"]: r for r in extras.outlier_counts(df).collect()}
    assert o["b"]["iqr_outliers"] == 0 and o["b"]["sigma3_outliers"] == 0


def test_simhash_near_pairs_radius_guard(docs):
    with pytest.raises(ValueError):
        dedup.simhash_near_pairs(docs, max_hamming=4)


def test_minhash_identical_docs_equal_sigs(docs):
    sigs = dedup.minhash_signatures(docs).collect()
    by_id = {}
    for r in sigs:
        by_id.setdefault(r["id"], {})[r["sig_idx"]] = r["sig_val"]
    assert by_id[0] == by_id[3]                     # exact dup: equal sigs
    shared = sum(1 for j in range(16) if by_id[0][j] == by_id[1][j])
    assert shared >= 8                              # near-dup: mostly equal
    shared_far = sum(1 for j in range(16) if by_id[0][j] == by_id[2][j])
    assert shared_far <= 4                          # unrelated: mostly differ


def test_minhash_pairs_finds_neardup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.minhash_dedup_pairs(docs, threshold=0.4).collect()}
    assert pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.4 <= pairs[(0, 1)] < 1.0
    assert (0, 2) not in pairs


def test_simhash(docs):
    sh = {r["id"]: r["simhash"]
          for r in dedup.simhash_signatures(docs).collect()}
    assert sh[0] == sh[3]
    ham_near = bin(sh[0] ^ sh[1]).count("1")
    ham_far = bin(sh[0] ^ sh[2]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(0, 3)] == 1.0 and (0, 1) in pairs


def test_ngram_containment_detects_subset(spark):
    """A short doc fully quoted inside a long one: containment(short in
    long) = 1.0 while jaccard stays low — the asymmetric detector's whole
    point. Unrelated docs emit nothing."""
    short = "alpha beta gamma delta epsilon"
    long_ = short + " plus a very much longer tail of many other words " \
                    "continuing on and on with unrelated content entirely"
    df = spark.createDataFrame(
        [(0, short), (1, long_), (2, "totally different text about cats")],
        "doc_id long, text string")
    rows = {(r["id_a"], r["id_b"]): r
            for r in dedup.ngram_containment_pairs(
                df, threshold=0.9).collect()}
    assert (0, 1) in rows
    r = rows[(0, 1)]
    assert r["containment_a"] == 1.0      # all of doc 0 inside doc 1
    assert r["containment_b"] < 0.5
    assert r["jaccard"] < 0.5
    assert not any(2 in k for k in rows)


def test_duplicated_ngram_fraction(spark):
    """Exact copies score dup_fraction 1.0; a unique doc scores 0.0."""
    df = spark.createDataFrame(
        [(0, "the same repeated body of text here"),
         (1, "the same repeated body of text here"),
         (2, "completely unique words nobody else uses anywhere")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.duplicated_ngram_fraction(df).collect()}
    assert got[0]["dup_fraction"] == 1.0 == got[1]["dup_fraction"]
    assert got[2]["dup_fraction"] == 0.0
    assert got[0]["n_shingles"] == got[1]["n_shingles"] > 0


def test_distinct_row_stats(spark):
    """Whole-row duplicates counted; NULL fields compare equal inside the
    tuple; column subset restricts the tuple."""
    from flink_descriptive_stats_spark.operators import extras
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (2, None), (3, "c")],
        "x long, y string")
    r = extras.distinct_row_stats(df).collect()[0]
    assert r["n_rows"] == 5 and r["distinct_rows"] == 3
    assert r["duplicate_rows"] == 2
    r2 = extras.distinct_row_stats(df, columns=["x"]).collect()[0]
    assert r2["distinct_rows"] == 3 and r2["duplicate_rows"] == 2


def test_json_profile_mixed_keys(spark):
    """Ragged key sets and mixed value types: presence counts per key,
    numeric stats only over the castable subset, NULL and malformed rows
    dropped, duplicate keys kept as separate entries (from_json map
    semantics, mirrored by the DuckDB MAP cast)."""
    from flink_descriptive_stats_spark.operators import extras
    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": "x"}'),
         (2, '{"a": 2.5}'),
         (3, '{"b": "y", "c": 7}'),
         (4, None),
         (5, 'not json at all'),
         (6, '{"a": 10, "a": 20}')],
        "id long, props string")
    got = {r["key"]: r for r in extras.json_profile(df).collect()}
    assert set(got) == {"a", "b", "c"}
    # row 6 contributes TWO 'a' entries (duplicates kept)
    assert got["a"]["present"] == 4 and got["a"]["numeric_n"] == 4
    assert got["a"]["min_val"] == 1.0 and got["a"]["max_val"] == 20.0
    assert got["b"]["present"] == 2 and got["b"]["numeric_n"] == 0
    assert got["b"]["mean_val"] is None
    assert got["c"]["present"] == 1 and got["c"]["min_val"] == 7.0


def test_json_profile_nested_values_cross_engine(spark, tmp_path):
    """ADVICE r4 (d): pin nested-value behavior on BOTH engines. Spark's
    from_json(map<string,string>) re-renders nested objects/arrays as
    compact JSON text; DuckDB's MAP(VARCHAR,VARCHAR) cast renders the
    same compact form (verified: number normalization 1.50->1.5 /
    1e2->100.0, \\u escapes decoded, booleans/nulls literal). The one
    known rendering divergence — integers beyond double precision keep
    their digits in Spark but render as a double in DuckDB — is invisible
    to the PROFILE because values only reach the output through
    TRY_CAST(double), which maps both renderings to the same double (and
    nested non-scalars to NULL on both). This test runs the full profile
    on both engines over a fixture exercising all of those shapes."""
    import duckdb
    from flink_descriptive_stats_spark.operators import extras
    from flink_descriptive_stats_spark.oracle_pipeline import (
        json_profile_sql)
    rows = [
        (1, '{"a": {"x": 1.50, "y": [2,3]}, "n": 1.50}'),
        (2, '{"a": { "x" :  1e2 , "s":"q\\"z" }, "n": 1e2}'),
        (3, '{"a": [1.0, 2.5e-3, "s"], "u": "\\u0041"}'),
        (4, '{"a": [true, null], "big": 123456789012345678901234567890}'),
        (5, '{"a": 007}'),                    # malformed -> dropped
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    path = str(tmp_path / "events")
    df.write.parquet(path)
    got = sorted(map(tuple, extras.json_profile(df).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM read_parquet('{path}/*.parquet')")
    want = sorted(map(tuple, con.execute(
        json_profile_sql("events", "props")).fetchall()))
    assert got == want
    keys = {t[0] for t in got}
    assert keys == {"a", "n", "u", "big"}     # nested 'a' profiled too


def test_contamination_report(spark):
    """A holdout doc copied verbatim from train scores matched_fraction
    1.0; a holdout doc with no shared shingles scores 0.0."""
    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "some other training document body")],
        "doc_id long, text string")
    holdout = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "entirely novel holdout material nothing shared")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.contamination_report(train, holdout).collect()}
    assert got[100]["matched_fraction"] == 1.0
    assert got[101]["matched_fraction"] == 0.0
    assert got[100]["n_shingles"] > 0


def test_ngram_jaccard_max_df_drops_heavy_hitter(spark):
    """A boilerplate shingle shared by every doc would fan out k(k-1)/2
    pairs; max_df drops it before the pair explosion. Pairs linked only by
    the boilerplate vanish; pairs sharing real content survive (their
    jaccard can only decrease — the safe under-merge direction)."""
    boiler = "copyright acme corp"
    rows = [(i, f"{boiler} unique body number {i} here") for i in range(10)]
    rows += [(100, f"{boiler} shared long tail of matching words"),
             (101, f"{boiler} shared long tail of matching words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    unfiltered = {(r["id_a"], r["id_b"])
                  for r in dedup.ngram_jaccard_pairs(
                      df, threshold=0.01).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in dedup.ngram_jaccard_pairs(
                  df, threshold=0.01, max_df=5).collect()}
    assert (100, 101) in unfiltered and (100, 101) in capped
    assert capped < unfiltered          # boilerplate-only pairs dropped
    # every boilerplate-only pair (both ids < 10) is gone under the cap
    assert not any(a < 10 and b < 10 for a, b in capped)


def test_ann_brute_force(spark):
    vecs = [(i, [1.0 if j == i % 4 else 0.1 * ((i * 7 + j) % 5)
                 for j in range(8)], 0) for i in range(20)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
    top = similarity.brute_force_topk(df, k=3, max_query_id=4)
    rows = top.collect()
    assert len(rows) == 12                       # 4 queries x top-3
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert -1.0 <= r["cos"] <= 1.0 + 1e-9
    r1 = {(r["query_id"], r["rank"]): r["cos"] for r in rows}
    for q in range(4):
        assert r1[(q, 1)] >= r1[(q, 2)] >= r1[(q, 3)]


def test_lsh_ann_recall(spark):
    from flink_descriptive_stats_spark.sources.tables import load_table
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.brute_force_topk(emb, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in similarity.lsh_topk(emb, k=3).collect()}
    # banded 8x5 multi-table LSH on near-random 64-dim data (top-3 cos only
    # ~0.35, the hard case for any LSH): measured recall 0.63 at ~22%
    # candidate fraction; bar 0.5 catches structural regressions like the
    # round-3 single-table collapse (recall 0.03)
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall collapsed: {recall}"
    # Hamming-1 multiprobe (query-side expansion, same index): measured
    # recall 1.0 on this fixture; bar 0.9 allows minor fixture drift
    probed = {(r["query_id"], r["neighbor_id"])
              for r in similarity.lsh_topk(emb, k=3,
                                           multiprobe=True).collect()}
    mp_recall = len(exact & probed) / len(exact)
    assert mp_recall >= 0.9, f"multiprobe recall: {mp_recall}"
    assert mp_recall >= recall


def test_text_stats_counts(spark):
    df = spark.createDataFrame(
        [(1, "The cat, the hat! 42 times.")], "doc_id long, text string")
    r = text_ops.text_stats(df).collect()[0]
    assert r["n_tokens"] == 6                   # the cat the hat 42 times
    assert r["n_ws_tokens"] == 6
    assert r["n_punct"] == 3                    # , ! .
    assert r["n_upper"] == 1                    # T
    assert r["n_digit"] == 2                    # 4 2
    assert r["n_stopwords"] == 2                # 'the' x2
    assert r["n_chars"] == len("The cat, the hat! 42 times.")


def test_lang_id_cjk(spark):
    df = spark.createDataFrame(
        [(1, "der und die das ist"), (2, "数据 处理 引擎"),
         (3, "the cat is in the hat")], "doc_id long, text string")
    got = {r["id"]: r["predicted_lang"]
           for r in text_ops.lang_id(df).collect()}
    assert got[1] == "de" and got[2] == "zh" and got[3] == "en"


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a"), (3, "a b x")],
        "doc_id long, text string")
    rows = {r["id"]: r for r in text_ops.fingerprints(df).collect()}
    # bag fingerprint is order-insensitive; sequence fingerprint is not
    assert rows[1]["bag_fingerprint"] == rows[2]["bag_fingerprint"]
    assert rows[1]["seq_fingerprint"] != rows[2]["seq_fingerprint"]
    assert rows[1]["bag_fingerprint"] != rows[3]["bag_fingerprint"]


def test_multimodal_features(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")],
                               "doc_id long, text string")
    rows = {r["id"]: r for r in multimodal.extract_features(df).collect()}
    assert rows[1]["n_bytes"] == 3
    assert rows[1]["byte_sum"] == ord("a") + ord("b") + ord("c")
    assert rows[1]["head_byte"] == ord("a") and rows[1]["tail_byte"] == ord("c")
    assert rows[2]["n_bytes"] == 0 and rows[2]["head_byte"] == -1
    assert len(rows[1]["feature"]) == 4


def test_decode_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_decontaminate_exact(spark, docs):
    """Exact mode drops only byte-identical leaks: holdout={0}, so the
    exact dup 3 goes, the near-dup 1 stays."""
    holdout = docs.where(F.col("doc_id") == 0)
    train = docs.where(F.col("doc_id") != 0)
    kept = sorted(r["doc_id"]
                  for r in dedup.decontaminate(train, holdout).collect())
    assert kept == [1, 2, 4]


def test_decontaminate_fuzzy(spark, docs):
    """Fuzzy mode also drops the near-duplicate (doc 1 differs from the
    holdout doc 0 by one token), and keeps unrelated content."""
    holdout = docs.where(F.col("doc_id") == 0)
    train = docs.where(F.col("doc_id") != 0)
    kept = sorted(
        r["doc_id"]
        for r in dedup.decontaminate(train, holdout, fuzzy=True).collect())
    assert 3 not in kept                 # exact dup always caught
    assert 1 not in kept                 # near-dup caught by band collision
    assert 2 in kept and 4 in kept       # unrelated content survives


def test_corpus_summary(spark):
    df = spark.createDataFrame(
        [(1, "one two three", "en", "web"),
         (2, "four five", "en", "web"),
         (3, "six", "en", "books"),
         (4, None, "de", "web")],          # NULL text excluded entirely
        "doc_id long, text string, lang string, source string")
    rows = {(r["lang"], r["source"]): r
            for r in text_ops.corpus_summary(df).collect()}
    assert set(rows) == {("en", "web"), ("en", "books")}
    assert rows[("en", "web")]["n_docs"] == 2
    assert rows[("en", "web")]["total_tokens"] == 5
    assert rows[("en", "web")]["total_chars"] == len("one two three") + len("four five")
    assert rows[("en", "books")]["n_docs"] == 1
    assert rows[("en", "books")]["total_tokens"] == 1


def test_hash_split_deterministic_and_stable(spark):
    """A doc's split is a pure function of (id, salt): identical across
    runs, and unchanged when other rows are added (stable under corpus
    growth)."""
    from flink_descriptive_stats_spark.operators import sampling
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"]
         for r in sampling.hash_split(df).collect()}
    b = {r["doc_id"]: r["split"]
         for r in sampling.hash_split(df.limit(100)).collect()}
    assert all(a[k] == v for k, v in b.items())
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 700                 # ~80% of 1000
    assert 50 < counts["val"] < 150 and 50 < counts["test"] < 150


def test_mixture_sample_rates(spark):
    from flink_descriptive_stats_spark.operators import sampling
    df = (spark.range(0, 2000).withColumnRenamed("id", "doc_id")
          .withColumn("source",
                      F.concat(F.lit("s"), F.col("doc_id") % 2)))
    out = sampling.mixture_sample(
        df, rates=(("s0", 0.0), ("s1", 1.0)), default_rate=0.5)
    srcs = [r["source"] for r in out.collect()]
    assert "s0" not in srcs                      # rate 0 drops everything
    assert srcs.count("s1") == 1000              # rate 1 keeps everything


def test_pack_sequences(spark):
    """Offsets are running token sums in id order within a shard; a pack is
    the max_tokens window where the doc STARTS."""
    from flink_descriptive_stats_spark.operators import sampling
    df = spark.createDataFrame(
        [(0, "a b c"), (2, "d e f g"), (4, "h i j k l m"), (6, None),
         (1, "x y")],
        "doc_id long, text string")
    rows = {r["id"]: r
            for r in sampling.pack_sequences(
                df, max_tokens=5, n_shards=2).collect()}
    assert 6 not in rows                         # NULL text excluded
    # shard 0: ids 0,2,4 with 3,4,6 tokens -> offsets 0,3,7
    assert (rows[0]["start_offset"], rows[2]["start_offset"],
            rows[4]["start_offset"]) == (0, 3, 7)
    assert (rows[0]["pack_id"], rows[2]["pack_id"],
            rows[4]["pack_id"]) == (0, 0, 1)
    assert rows[1]["shard"] == 1 and rows[1]["start_offset"] == 0
    # partitioning invariance (the window order key is total per shard)
    again = {r["id"]: tuple(r)
             for r in sampling.pack_sequences(
                 df.repartition(16), max_tokens=5, n_shards=2).collect()}
    assert again == {r["id"]: tuple(r) for r in rows.values()}


def test_ivf_topk_recall_and_exactness(spark):
    """IVF returns true cosines (exact re-rank inside probed cells) and
    recalls most of the brute-force top-k on the test embeddings."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["query_id"], r["neighbor_id"]): r["cos"]
             for r in similarity.brute_force_topk(df, k=5).collect()}
    ivf = {(r["query_id"], r["neighbor_id"]): r["cos"]
           for r in similarity.ivf_topk(df, k=5).collect()}
    hits = set(ivf) & set(exact)
    assert len(hits) / len(exact) >= 0.5          # probe-limited recall
    for pair in hits:                             # cosines are exact
        assert ivf[pair] == exact[pair]


def test_neardup_clusters_and_corpus(spark, docs):
    """Docs 0/1 (near-dup) and 0/3 (exact dup) form one cluster labeled by
    the min id; 2 and 4 stay singletons; the deduped corpus keeps exactly
    one representative per cluster."""
    labels = {r["id"]: r["cluster_id"]
              for r in dedup.neardup_clusters(docs).collect()}
    assert labels[0] == labels[1] == labels[3] == 0
    assert labels[2] == 2 and labels[4] == 4
    kept = sorted(r["doc_id"] for r in dedup.dedup_corpus(docs).collect())
    assert kept == [0, 2, 4]


def test_neardup_clusters_transitive_chain(spark):
    """A~B and B~C link into ONE component even when A~C alone is below
    the pair threshold (the reason clustering exists at all)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    a = " ".join(toks)
    b = " ".join(toks[:8] + ["mu", "nu"])        # shares 6/14 shingle-ish
    c = " ".join(toks[:6] + ["mu", "nu", "xi", "omicron"])
    df = spark.createDataFrame([(10, a), (11, b), (12, c)],
                               "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"])
             for r in dedup.minhash_dedup_pairs(df).collect()}
    labels = {r["id"]: r["cluster_id"]
              for r in dedup.neardup_clusters(df).collect()}
    if (10, 11) in pairs and (11, 12) in pairs and (10, 12) not in pairs:
        assert labels[10] == labels[11] == labels[12] == 10
    # regardless of which pairs fired, labels must respect the pair graph
    for x, y in pairs:
        assert labels[x] == labels[y]


def test_vocabulary(spark):
    df = spark.createDataFrame(
        [(1, "spark spark flink"), (2, "spark beam"), (3, None)],
        "doc_id long, text string")
    rows = {r["token"]: (r["n_total"], r["n_docs"])
            for r in text_ops.vocabulary(df, min_count=2).collect()}
    assert rows == {"spark": (3, 2)}             # others below min_count


def test_countmin_one_sided_error(spark):
    """Count-min never underestimates; with a wide grid (no collisions on
    a tiny vocab) estimates are exact."""
    from flink_descriptive_stats_spark.operators import sketch
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d"), (3, None)],
        "doc_id long, text string")
    exact = {"a": 4, "b": 3, "c": 1, "d": 1}
    wide = {r["token"]: r["est"]
            for r in sketch.countmin_topk(df, k=10, width=4096).collect()}
    assert wide == exact
    narrow = {r["token"]: r["est"]
              for r in sketch.countmin_topk(df, k=10, width=2).collect()}
    assert all(narrow[t] >= exact[t] for t in exact)


def test_countmin_floor_prune_is_output_invariant(spark):
    """The frequency-floor candidate prune (VERDICT r4 item #6) actually
    binds on a wide-vocabulary corpus (floor > 0, so only near-heavy
    tokens reach the distinct shuffle) and the pruned top-k is IDENTICAL
    to the unpruned full-vocabulary ranking — pruning is output-invariant
    by the floor's subset-order-statistic soundness argument."""
    from pyspark.sql import functions as F
    from flink_descriptive_stats_spark.operators import sketch
    # 20 heavy hitters (~90 occurrences) + ~1800 one-off filler tokens
    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("hot"), (F.col("id") % 20).cast("string")),
            F.concat(F.lit("hot"), (F.col("id") % 20).cast("string")),
            F.concat(F.lit("hot"), (F.col("id") % 20).cast("string")),
            F.concat(F.lit("ua"), F.col("id").cast("string")),
            F.concat(F.lit("ub"), F.col("id").cast("string")),
            F.concat(F.lit("uc"), F.col("id").cast("string"))).alias("text"))
    grid_rows = sketch.countmin_sketch(df, "text").collect()
    occ = sketch._token_occurrences(df, "text")
    est_c = sketch.estimate_expr(grid_rows)
    floor = sketch.candidate_floor(occ, grid_rows, k=20)
    assert floor >= 90                    # the heavy hitters set the floor
    n_cand = occ.where(est_c >= F.lit(floor)).distinct().count()
    n_vocab = occ.distinct().count()
    assert n_cand < n_vocab / 10          # far fewer tokens reach the shuffle
    pruned = sorted(map(tuple, sketch.countmin_topk(df, "text").collect()))
    full = sorted(map(tuple, sketch.countmin_topk(
        df, "text", prune=False).collect()))
    assert pruned == full and len(pruned) == 20
    # the narrow literal-array estimate agrees with the broadcast-join one
    grid_df = sketch.countmin_sketch(df, "text")
    joined = {r["token"]: r["est"] for r in sketch.estimate_tokens(
        grid_df, occ.distinct()).collect()}
    narrow = {r["token"]: r["est"] for r in occ.distinct().select(
        "token", est_c.alias("est")).collect()}
    assert joined == narrow


def test_asof_join_semantics(spark):
    """Backward as-of: latest right at-or-before each left ts per key;
    inclusive boundary; NULLs before the first right row; keys don't mix."""
    from flink_descriptive_stats_spark.operators import joins
    left = spark.createDataFrame(
        [(1, 5, 100, "view", 1.0), (2, 10, 100, "view", 2.0),
         (3, 20, 100, "view", 3.0), (4, 10, 200, "view", 4.0)],
        "event_id long, ts long, user_id long, event_type string, value double")
    right = spark.createDataFrame(
        [(50, 10, 100, "purchase", 9.0), (51, 15, 100, "purchase", 8.0)],
        "event_id long, ts long, user_id long, event_type string, value double")
    got = {r["event_id"]: (r["asof_event_id"], r["asof_value"])
           for r in joins.asof_join(left, right).collect()}
    assert got[1] == (None, None)      # before any purchase
    assert got[2] == (50, 9.0)         # equal ts matches (inclusive)
    assert got[3] == (51, 8.0)         # latest of the two priors
    assert got[4] == (None, None)      # other user: no bleed across keys


def test_range_join_bucketing(spark):
    """Intervals spanning many coarse buckets still match (explode covers
    every bucket); out-of-range points and other keys don't."""
    from flink_descriptive_stats_spark.operators import joins
    pts = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:30:00"), (2, 100, "2024-01-01 09:59:59"),
         (3, 100, "2024-01-01 10:00:00"), (4, 200, "2024-01-01 00:30:00")],
        "event_id long, user_id long, ts string").withColumn(
            "ts", F.to_timestamp("ts"))
    iv = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", "2024-01-01 10:00:00")],
        "user_id long, session_start string, session_end string"
        ).withColumn("session_start", F.to_timestamp("session_start")
        ).withColumn("session_end", F.to_timestamp("session_end"))
    got = sorted(r["event_id"] for r in
                 joins.range_join(pts, iv, bucket_seconds=600).collect())
    assert got == [1, 2]      # 3 is at the exclusive end; 4 is another key


def test_ivf_kmeans_refinement_recovers_bad_seeds(spark):
    """Lloyd-refined IVF: with deliberately degenerate seeds (the first
    n_cells ids all in ONE true cluster) the refined centroids migrate to
    the real clusters and recall at n_probe=1 jumps; the loop is
    deterministic (no RNG, fixed iterations, id-tiebroken argmax)."""
    import numpy as np
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (4, 16))
    rows, vid = [], 0
    for _ in range(4):          # seeds: all near center 0
        rows.append((vid, (centers[0] + rng.normal(0, 0.05, 16)).tolist(), 0))
        vid += 1
    for c in range(4):
        for _ in range(20):
            rows.append(
                (vid, (centers[c] + rng.normal(0, 0.05, 16)).tolist(), c))
            vid += 1
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>, "
                               "label int")
    truth = {(r["query_id"], r["neighbor_id"]) for r in
             similarity.brute_force_topk(df, k=5, max_query_id=10).collect()}

    def recall(iters):
        got = {(r["query_id"], r["neighbor_id"]) for r in
               similarity.ivf_topk(df, k=5, n_cells=4, n_probe=1,
                                   max_query_id=10,
                                   refine_iters=iters).collect()}
        return len(got & truth) / len(truth)

    r0, r2 = recall(0), recall(2)
    assert r2 > r0 + 0.2, (r0, r2)      # measured: 0.48 -> 0.78
    a = sorted(map(tuple, similarity.ivf_topk(
        df.repartition(64), k=5, n_cells=4, n_probe=1, max_query_id=10,
        refine_iters=2).collect()))
    b = sorted(map(tuple, similarity.ivf_topk(
        df, k=5, n_cells=4, n_probe=1, max_query_id=10,
        refine_iters=2).collect()))
    assert a == b                        # partitioning-invariant


def test_connected_components_star(spark):
    """large-star/small-star CC (the O(log n)-round extreme-scale path)
    matches union-find ground truth on random graphs, resolves a
    diameter-99 chain (the case min-label propagation is slow at), and
    agrees with the propagation-based neardup_clusters on the docs
    fixture."""
    import numpy as np

    def brute_cc(n_nodes, edge_list):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edge_list:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        comp = {}
        for i in range(n_nodes):
            comp.setdefault(find(i), []).append(i)
        return {x: min(m) for m in comp.values() for x in m}

    rng = np.random.default_rng(3)
    for _ in range(2):
        n = 30
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(25)]
        edges = [(u, v) for u, v in edges if u != v]
        e = spark.createDataFrame(edges, "u long, v long")
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        got = {r["id"]: r["cluster_id"] for r in
               dedup.connected_components_star(e, nodes).collect()}
        assert got == brute_cc(n, edges)

    chain = spark.createDataFrame([(i, i + 1) for i in range(99)],
                                  "u long, v long")
    nodes = spark.createDataFrame([(i,) for i in range(100)], "id long")
    got = {r["id"]: r["cluster_id"] for r in
           dedup.connected_components_star(chain, nodes).collect()}
    assert set(got.values()) == {0}


def test_neardup_clusters_star_equals_propagate(docs):
    a = sorted(map(tuple, dedup.neardup_clusters(docs).collect()))
    b = sorted(map(tuple,
                   dedup.neardup_clusters(docs, method="star").collect()))
    assert a == b


def _make_ppm():
    import numpy as np
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    return b"P6\n# comment\n3 2\n255\n" + img.tobytes(), img


def _make_bmp(img):
    """Minimal bottom-up 24-bit BMP from a uint8 (H, W, 3) RGB array."""
    import struct
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b""
    for r in range(h - 1, -1, -1):                 # bottom-up
        row = img[r][:, ::-1].tobytes()            # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                            0, 0, 0, 0))
    return header + rows


def _make_wav():
    import struct

    import numpy as np
    rate = 8000
    t = np.arange(800)
    samples = (10000 * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
    return payload, rate, samples


def test_decode_image_ppm_bmp_exact():
    """Uncompressed decode is REAL: PPM and BMP round-trip to exact pixels;
    nearest-neighbor resize keeps exact source pixels."""
    import numpy as np
    ppm, img = _make_ppm()
    got = multimodal.decode_image(ppm)
    assert np.array_equal(got, img)
    assert np.array_equal(multimodal.decode_image(_make_bmp(img)), img)
    # P3 ascii form decodes identically
    p3 = (b"P3\n3 2\n255\n"
          + " ".join(str(x) for x in img.flatten()).encode())
    assert np.array_equal(multimodal.decode_image(p3), img)
    resized = multimodal.decode_image(multimodal.resize_image(ppm, 6, 4))
    assert resized.shape == (4, 6, 3)
    assert np.array_equal(resized[::2][:, ::2], img)   # NN keeps sources
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_image_audio_features_spark(spark):
    """The mapInPandas feature extractors: decodable payloads get real
    features, garbage degrades to decoded=false (never fails the batch)."""
    import numpy as np
    ppm, img = _make_ppm()
    wav, rate, samples = _make_wav()
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(b"not an image"))],
        "id long, payload binary")
    rows = {r["id"]: r for r in multimodal.image_features(df).collect()}
    assert rows[1]["decoded"] and not rows[2]["decoded"]
    assert (rows[1]["width"], rows[1]["height"]) == (3, 2)
    assert abs(rows[1]["mean_r"] - img[:, :, 0].mean()) < 1e-9

    adf = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"RIFFxxxx"))],
        "id long, payload binary")
    arows = {r["id"]: r for r in multimodal.audio_features(adf).collect()}
    assert arows[1]["decoded"] and not arows[2]["decoded"]
    assert arows[1]["sample_rate"] == rate
    assert abs(arows[1]["duration_s"] - 0.1) < 1e-9
    want_rms = float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
    assert abs(arows[1]["rms"] - want_rms) < 1e-6


def test_range_join_pre_epoch_and_inverted(spark):
    """The round-2 floor-div fix: pre-epoch (negative-micros) points land
    in the same bucket as their covering interval (truncating `div` used to
    round toward zero and silently drop the match); inverted intervals
    (end <= start) match nothing instead of exploding a descending bucket
    sequence."""
    from flink_descriptive_stats_spark.operators import joins
    pts = spark.createDataFrame(
        [(1, 100, "1969-12-31 23:30:00"),    # pre-epoch, inside interval
         (2, 100, "1969-12-31 22:59:59"),    # pre-epoch, before interval
         (3, 100, "1970-01-01 00:30:00")],   # post-epoch, inside
        "event_id long, user_id long, ts string").withColumn(
            "ts", F.to_timestamp("ts"))
    iv = spark.createDataFrame(
        [(100, "1969-12-31 23:00:00", "1970-01-01 01:00:00"),
         (100, "1970-01-01 02:00:00", "1970-01-01 02:00:00")],  # inverted
        "user_id long, session_start string, session_end string"
        ).withColumn("session_start", F.to_timestamp("session_start")
        ).withColumn("session_end", F.to_timestamp("session_end"))
    got = sorted(r["event_id"] for r in
                 joins.range_join(pts, iv, bucket_seconds=3600).collect())
    assert got == [1, 3]


def test_minhash_bucket_cap_drops_boilerplate(spark):
    """The LSH skew guard: a boilerplate cluster wider than max_bucket is
    dropped from band-join candidate generation (its members still dedup
    via the exact md5 path); small buckets are unaffected."""
    rows = [(i, "identical boilerplate page body") for i in range(12)]
    rows += [(100, "a unique near dup of something"),
             (101, "a unique near dup of something")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r["id_a"], r["id_b"]) for r in
                dedup.minhash_dedup_pairs(df, threshold=0.5).collect()}
    capped = {(r["id_a"], r["id_b"]) for r in
              dedup.minhash_dedup_pairs(df, threshold=0.5,
                                        max_bucket=10).collect()}
    assert (100, 101) in uncapped and (0, 1) in uncapped
    assert (100, 101) in capped          # small bucket survives
    assert not any(a < 100 for a, b in capped)   # boilerplate dropped


def test_skewed_corpus_joint_recovery(spark):
    """VERDICT r4 item #7: the cap + md5 interplay END TO END. A
    boilerplate cluster wider than max_bucket poisons every band bucket it
    touches (including the bucket shared with its near-dup variant), so
    minhash alone misses ALL its pairs on the raw corpus — but running
    exact_dedup/keep_first FIRST collapses the identical mass to one rep,
    after which every bucket is small and the band join recovers the
    remaining near-dup edges. Together the two passes recover every
    duplicate group in the skewed corpus."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango")
    rows = [(i, base) for i in range(60)]                # exact mega-group
    rows.append((200, base.rsplit(" ", 1)[0] + " zulu"))  # near-dup variant
    pair_base = " ".join(f"word{i}" for i in range(40))
    rows += [(100, pair_base + " ending leap"),
             (101, pair_base + " ending jump")]   # jaccard ~0.95
    rows += [(300 + i,
              f"totally distinct document number{i} about topic{i} "
              f"with payload{i} words{i} unlike anything else{i}")
             for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # direct minhash with the cap active: the mega-bucket (61 members,
    # > max_bucket=30) is dropped, so NO boilerplate pairs — not even to
    # the variant — while the small near-dup pair still surfaces
    direct = {(r["id_a"], r["id_b"]) for r in dedup.minhash_dedup_pairs(
        df, threshold=0.5, max_bucket=30).collect()}
    assert (100, 101) in direct
    assert not any(a < 100 or b == 200 for a, b in direct)

    # the md5 path owns the identical mass: one group, rep 0, 60 copies
    groups = {r["rep_id"]: r["dup_count"]
              for r in dedup.exact_dedup(df).collect()}
    assert groups[0] == 60

    # exact-first pipeline: keep_first shrinks the corpus, buckets are
    # small again, and the band join recovers the variant edge
    reps = dedup.keep_first(df)
    assert reps.count() == 1 + 1 + 2 + 10
    after = {(r["id_a"], r["id_b"]) for r in dedup.minhash_dedup_pairs(
        reps, threshold=0.5, max_bucket=30).collect()}
    assert after == {(0, 200), (100, 101)}   # all duplicate groups found


def test_empty_input_graceful(spark):
    """Zero-row inputs: profile emits one row per column with NULL stats,
    grouped/top-K/dedup operators emit zero rows, nothing raises."""
    from flink_descriptive_stats_spark.operators import extras
    from flink_descriptive_stats_spark.operators import profile as prof
    from flink_descriptive_stats_spark.operators import topk
    empty = spark.createDataFrame([], "doc_id long, text string, x double")
    p = {r["column"]: r for r in prof.profile(empty).collect()}
    assert set(p) == {"doc_id", "text", "x"}
    assert p["x"]["row_count"] == 0 and p["x"]["mean"] is None
    assert topk.topk_tokens(empty).count() == 0
    assert dedup.exact_dedup(empty).count() == 0
    assert dedup.minhash_signatures(empty).count() == 0
    q = {r["column"]: r for r in extras.quantiles(empty).collect()}
    assert q["x"]["q_50"] is None
    assert prof.complete_row_count(empty).collect()[0]["complete_count"] == 0


def test_psi_drift_semantics(spark):
    """PSI is ~0 for identical snapshots and clearly positive for a
    shifted one; underflow/overflow buckets catch out-of-range drift."""
    from flink_descriptive_stats_spark.operators import extras
    a = spark.createDataFrame([(i, float(i % 100)) for i in range(1000)],
                              "doc_id long, x double")
    same = extras.psi_drift(a, a, "x")
    total_same = sum(float(r["psi_term"].replace("e", "E"))
                     for r in same.collect())
    assert abs(total_same) < 1e-9
    b = spark.createDataFrame(
        [(i, float(i % 100) + 60.0) for i in range(1000)],
        "doc_id long, x double")
    drifted = extras.psi_drift(a, b, "x")
    rows = {r["bucket"]: r for r in drifted.collect()}
    total = sum(float(r["psi_term"].replace("e", "E"))
                for r in rows.values())
    assert total > 0.2                      # conventional "significant"
    assert rows[10]["n_b"] > 0 and rows[10]["n_a"] == 0   # overflow bucket


def test_pii_scan_and_redact(spark):
    """PII regexes: exact hit counts per class; redaction replaces each
    class with its typed placeholder in order (cards before phones so the
    looser phone shape can't eat a card body)."""
    txt = ("mail a@b.co and c.d+x@e-f.org, card 4111 1111 1111 1111, "
           "ssn 123-45-6789, ip 10.0.0.1, call +1 555 000-1234 now")
    df = spark.createDataFrame([(1, txt), (2, "clean text"), (3, None)],
                               "doc_id long, text string")
    scan = {r["id"]: r for r in text_ops.pii_scan(df).collect()}
    assert set(scan) == {1, 2}                      # NULL text excluded
    r = scan[1]
    assert r["n_email"] == 2 and r["n_credit_card"] == 1
    assert r["n_ssn"] == 1 and r["n_ipv4"] == 1 and r["n_phone"] == 1
    assert r["n_pii"] == 6
    assert scan[2]["n_pii"] == 0
    red = {r["id"]: r["text"] for r in text_ops.pii_redact(df).collect()}
    assert red[1] == ("mail <EMAIL> and <EMAIL>, card <CREDIT_CARD>, "
                      "ssn <SSN>, ip <IPV4>, call <PHONE> now")
    assert red[2] == "clean text"


def test_repetition_stats(spark):
    """Gopher-style repetition: a doc that repeats one phrase has high
    dup-token and top-bigram fractions; an all-unique doc has zero dup
    fraction and uniform bigrams."""
    df = spark.createDataFrame(
        [(1, "buy now " * 10), (2, "one two three four five")],
        "doc_id long, text string")
    r = {x["id"]: x for x in text_ops.repetition_stats(df).collect()}
    assert r[1]["n_tokens"] == 20
    assert abs(r[1]["dup_token_frac"] - 0.9) < 1e-12      # 2 distinct of 20
    # bigrams of "buy now buy now...": "buy now" x10, "now buy" x9 -> 10/19
    assert abs(r[1]["top_bigram_frac"] - 10.0 / 19.0) < 1e-12
    assert r[2]["dup_token_frac"] == 0.0
    assert abs(r[2]["top_bigram_frac"] - 0.25) < 1e-12    # 4 uniform bigrams


def test_range_join_differential_random(spark):
    """Differential check: range_join == brute-force O(n*m) membership on
    random data spanning the epoch (negative timestamps included) with
    random bucket sizes — the bucketing must be invisible in the result."""
    import numpy as np
    rng = np.random.default_rng(11)
    from flink_descriptive_stats_spark.operators import joins
    base = -50_000  # seconds; spans pre/post epoch
    pts = [(i, int(rng.integers(0, 3)), int(rng.integers(base, 100_000)))
           for i in range(120)]
    ivs = []
    for j in range(40):
        s = int(rng.integers(base, 100_000))
        ivs.append((int(rng.integers(0, 3)), s,
                    s + int(rng.integers(-1000, 50_000))))  # some inverted
    want = sorted((p_id, k, s, e) for p_id, k, t in pts
                  for (ik, s, e) in ivs if ik == k and s <= t < e)
    pdf = spark.createDataFrame(pts, "event_id long, user_id long, sec long") \
        .selectExpr("event_id", "user_id",
                    "timestamp_seconds(sec) AS ts")
    idf = spark.createDataFrame(ivs, "user_id long, s long, e long") \
        .selectExpr("user_id", "timestamp_seconds(s) AS session_start",
                    "timestamp_seconds(e) AS session_end")
    for bucket in (7, 3600, 100_000):
        got = sorted((r["event_id"], r["user_id"],
                      int(r["session_start"].timestamp()),
                      int(r["session_end"].timestamp()))
                     for r in joins.range_join(
                         pdf, idf, bucket_seconds=bucket).collect())
        assert got == want, f"bucket_seconds={bucket}"


def test_asof_join_differential_random(spark):
    """Differential check: as-of join == brute-force latest-at-or-before
    per key on random data with duplicate timestamps across sides."""
    import numpy as np
    rng = np.random.default_rng(13)
    from flink_descriptive_stats_spark.operators import joins
    left = [(i, int(rng.integers(0, 50)), int(rng.integers(0, 4)),
             "view", float(i)) for i in range(150)]
    right = [(1000 + j, int(rng.integers(0, 50)), int(rng.integers(0, 4)),
              "purchase", float(j)) for j in range(60)]

    def brute(eid, ts, uid):
        cands = [(r_ts, r_eid, r_val) for r_eid, r_ts, r_uid, _, r_val
                 in right if r_uid == uid and r_ts <= ts]
        if not cands:
            return (None, None)
        # operator tie-break: latest ts, then highest event id
        r_ts, r_eid, r_val = max(cands)
        return (r_eid, r_val)

    ldf = spark.createDataFrame(
        [(e, t, u, k, v) for e, t, u, k, v in left],
        "event_id long, sec long, user_id long, event_type string, "
        "value double").selectExpr(
            "event_id", "timestamp_seconds(sec) AS ts", "user_id",
            "event_type", "value")
    rdf = spark.createDataFrame(
        [(e, t, u, k, v) for e, t, u, k, v in right],
        "event_id long, sec long, user_id long, event_type string, "
        "value double").selectExpr(
            "event_id", "timestamp_seconds(sec) AS ts", "user_id",
            "event_type", "value")
    got = {r["event_id"]: (r["asof_event_id"], r["asof_value"])
           for r in joins.asof_join(ldf, rdf).collect()}
    for e, t, u, _, _ in left:
        assert got[e] == brute(e, t, u), (e, t, u, got[e], brute(e, t, u))


def test_stratified_sample(spark):
    """Exact k per stratum (clipped to stratum size), deterministic and
    partitioning-invariant; plan uses WindowGroupLimit (no full sort)."""
    from flink_descriptive_stats_spark.operators import sampling
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(60)]
    rows += [(1000, "rare")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sampling.stratified_sample(df, "lang", k=5).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], []).append(r["doc_id"])
    assert {s: len(v) for s, v in by.items()} == {
        "en": 5, "de": 5, "fr": 5, "rare": 1}
    again = sampling.stratified_sample(df.repartition(64), "lang",
                                       k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    plan = df.sparkSession._jvm.PythonSQLUtils  # noqa: F841  (import guard)
    p = sampling.stratified_sample(df, "lang", k=5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p


def test_chunk_documents(spark):
    """Chunking covers every token; consecutive chunks share exactly
    `overlap` tokens; short docs yield one chunk; empty/NULL docs none."""
    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, words), (2, "just four little words"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = text_ops.chunk_documents(df, max_tokens=40, overlap=10)
    rows = sorted(((r["id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"])
                   for r in out.collect()))
    by_id = {}
    for i, ci, n, t in rows:
        by_id.setdefault(i, []).append((ci, n, t.split()))
    # doc 1: 100 tokens, stride 30 -> 4 chunks at 0/30/60/90
    assert [c[0] for c in by_id[1]] == [0, 1, 2, 3]
    assert [c[1] for c in by_id[1]] == [40, 40, 40, 10]
    covered = set()
    for _, _, toks in by_id[1]:
        covered.update(toks)
    assert covered == {f"w{i}" for i in range(100)}
    assert by_id[1][0][2][-10:] == by_id[1][1][2][:10]   # 10-token overlap
    assert by_id[2] == [(0, 4, ["just", "four", "little", "words"])]
    assert 3 not in by_id and 4 not in by_id
    with pytest.raises(ValueError):
        text_ops.chunk_documents(df, max_tokens=10, overlap=10)


def test_distinct_counts_auto_routes_wide_tables(spark):
    """distinct_counts(exact=None) keeps the exact Expand plan on narrow
    tables but auto-routes tables wider than EXACT_DISTINCT_MAX_COLUMNS to
    the HLL++ path (visible via the approx_distinct_count column name)."""
    from flink_descriptive_stats_spark.operators import extras

    narrow = spark.range(100).selectExpr("id a", "id % 7 b")
    got = extras.distinct_counts(narrow)
    assert got.columns == ["column", "distinct_count"]
    assert {r["column"]: r["distinct_count"] for r in got.collect()} == {
        "a": 100, "b": 7}

    wide = spark.range(100).select(
        *[(F.col("id") % (i + 2)).alias(f"c{i}")
          for i in range(extras.EXACT_DISTINCT_MAX_COLUMNS + 1)])
    routed = extras.distinct_counts(wide)
    assert routed.columns == ["column", "approx_distinct_count"]
    assert routed.count() == extras.EXACT_DISTINCT_MAX_COLUMNS + 1
    # forcing exact overrides the width routing
    forced = extras.distinct_counts(wide, exact=True)
    assert forced.columns == ["column", "distinct_count"]
    assert {r["column"]: r["distinct_count"]
            for r in forced.collect()}["c0"] == 2


def test_corpus_overlap_semantics(spark):
    from flink_descriptive_stats_spark.operators import dedup
    a = spark.createDataFrame(
        [(1, "w x y z"), (2, "p q r s")], "doc_id bigint, text string")
    # b shares doc 1's content exactly, nothing else
    b = spark.createDataFrame(
        [(10, "w x y z"), (11, "m n o p q")], "doc_id bigint, text string")
    r = dedup.corpus_overlap(a, b).collect()[0]
    # trigram shingles: a has {wxy, xyz, pqr, qrs}; b has {wxy, xyz,
    # mno, nop, opq} -> common = 2, union = 7
    assert r["n_shingles_a"] == 4 and r["n_shingles_b"] == 5
    assert r["n_common"] == 2
    assert abs(float(r["jaccard"].replace("e", "E")) - 2 / 7) < 1e-6
    assert abs(float(r["containment_a_in_b"].replace("e", "E")) - 0.5) \
        < 1e-6


def test_shared_prefix_groups_semantics(spark):
    from flink_descriptive_stats_spark.operators import dedup
    docs = [(3, "dear customer your account needs attention"),
            (1, "dear customer we value your feedback"),
            (2, "hello world unrelated body"),
            (4, None), (5, "")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["prefix"]: r for r in
           dedup.shared_prefix_groups(df, k_tokens=2).collect()}
    # only the form-letter template groups; representative = min id
    assert set(got) == {"dear customer"}
    assert got["dear customer"]["n_docs"] == 2
    assert got["dear customer"]["example_id"] == 1
