"""Round-5 operator families: column entropy, referential integrity,
Benford leading digits, tf-idf top terms, equi-depth histogram. Oracle
parity is covered by the driver gate / tools/verify_local.py; these tests
pin the statistical semantics on constructed inputs."""

import math

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.operators import extras
from flink_descriptive_stats_spark.operators import text as text_ops


@pytest.fixture(scope="module")
def spark():
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .appName("round5-ops").getOrCreate())
    yield s


def _f(x):
    return float(x.replace("e", "E")) if isinstance(x, str) else x


def test_column_entropy_semantics(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 1, None), ("b", 1, None), ("b", 1, None)],
        "s string, c int, z string")
    got = {r["column"]: r for r in extras.column_entropy(df).collect()}
    # two equiprobable values: H = ln 2, normalized 1.0, modal share 0.5
    assert math.isclose(_f(got["s"]["entropy"]), math.log(2), rel_tol=1e-5)
    assert math.isclose(_f(got["s"]["entropy_norm"]), 1.0, rel_tol=1e-5)
    assert math.isclose(_f(got["s"]["top_freq"]), 0.5, rel_tol=1e-5)
    assert got["s"]["distinct_values"] == 2
    # constant column: zero entropy, norm defined as 0, modal share 1
    assert math.isclose(_f(got["c"]["entropy"]), 0.0, abs_tol=1e-9)
    assert _f(got["c"]["entropy_norm"]) == 0.0
    assert math.isclose(_f(got["c"]["top_freq"]), 1.0, rel_tol=1e-5)
    # all-NULL column: counts only, stats NULL
    assert got["z"]["n_non_null"] == 0 and got["z"]["null_count"] == 4
    assert got["z"]["entropy"] is None


def test_referential_integrity_semantics(spark):
    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "fk bigint")
    dim = spark.createDataFrame([(1,), (2,), (2,)], "pk bigint")
    r = extras.referential_integrity(fact, dim, "fk", "pk").collect()[0]
    assert r["fk_rows"] == 4 and r["null_fk"] == 1
    assert r["matched"] == 3 and r["orphans"] == 1
    assert r["distinct_orphan_keys"] == 1
    assert math.isclose(_f(r["orphan_fraction"]), 0.25, rel_tol=1e-5)


def test_benford_digits_semantics(spark):
    rows = [(123,), (145,), (199,), (201,), (0,), (None,), (-307,), (912,)]
    df = spark.createDataFrame(rows, "x bigint")
    got = {r["digit"]: r for r in extras.benford_digits(df, "x").collect()}
    # 0 and NULL excluded; sign ignored; counts by first nonzero digit
    assert {d: got[d]["n"] for d in got} == {1: 3, 2: 1, 3: 1, 9: 1}
    assert math.isclose(_f(got[1]["expected"]), math.log10(2), rel_tol=1e-5)
    assert math.isclose(_f(got[1]["frac"]), 0.5, rel_tol=1e-5)
    # float columns are rejected by design (engine-specific rendering)
    fdf = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError):
        extras.benford_digits(fdf, "x")


def test_tfidf_semantics(spark):
    df = spark.createDataFrame(
        [(1, "apple apple banana shared"),
         (2, "cherry shared shared"),
         (3, "banana cherry shared")],
        "doc_id long, text string")
    out = text_ops.tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1's top term is its doubled exclusive token
    top1 = sorted(by_doc[1], key=lambda r: r["rank"])[0]
    assert top1["token"] == "apple" and top1["tf"] == 2
    assert top1["df_docs"] == 1
    # idf math: N=3 docs, smoothed — apple score = 2*(ln(4/2)+1)
    assert math.isclose(_f(top1["tfidf"]),
                        2 * (math.log(4 / 2) + 1), rel_tol=1e-5)
    # doc 2: tf dominance — doubled 'shared' (idf exactly 1) beats the
    # single exclusive 'cherry' (2*1 > 1*(ln(4/3)+1))
    top2 = sorted(by_doc[2], key=lambda r: r["rank"])[0]
    assert top2["token"] == "shared" and _f(top2["tfidf"]) == 2.0
    # doc 3: equal tfs, so the rarer terms outrank ubiquitous 'shared'
    top3 = sorted(by_doc[3], key=lambda r: r["rank"])[0]
    assert top3["token"] in ("banana", "cherry")
    assert all(len(v) == 2 for v in by_doc.values())


def test_histogram_equidepth_semantics(spark):
    # heavily skewed data: equal-width would dump ~everything in bucket 0;
    # equi-depth buckets stay balanced
    vals = [(float(i),) for i in range(100)] + [(1e6,)]
    df = spark.createDataFrame(vals, "x double")
    rows = extras.histogram_equidepth(df, "x", buckets=5).collect()
    assert len(rows) == 5
    counts = [r["cnt"] for r in sorted(rows, key=lambda r: r["bucket"])]
    assert sum(counts) == 101
    assert max(counts) <= 25          # no collapsed mega-bucket
    lo = [r["lo"] for r in sorted(rows, key=lambda r: r["bucket"])]
    assert lo[0] == 0.0 and lo == sorted(lo)
    # all-NULL column degrades to an empty frame
    empty = spark.createDataFrame([(None,)], "x double")
    assert extras.histogram_equidepth(empty, "x").count() == 0


def test_categorical_association_semantics(spark):
    # perfectly dependent pair: V = 1, MI = ln(2); independent pair: ~0
    dep = spark.createDataFrame(
        [("x", "p")] * 5 + [("y", "q")] * 5, "a string, b string")
    r = extras.categorical_association(dep, "a", "b").collect()[0]
    assert r["n"] == 10 and r["distinct_a"] == r["distinct_b"] == 2
    assert math.isclose(_f(r["cramers_v"]), 1.0, rel_tol=1e-5)
    assert math.isclose(_f(r["mutual_info"]), math.log(2), rel_tol=1e-5)
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "a string, b string")
    r2 = extras.categorical_association(ind, "a", "b").collect()[0]
    assert abs(_f(r2["chi2"])) < 1e-9
    assert abs(_f(r2["mutual_info"])) < 1e-9


def test_char_entropy_semantics(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, None)],
        "doc_id long, text string")
    got = {r["id"]: r for r in text_ops.char_entropy(df).collect()}
    assert set(got) == {1, 2}            # empty/NULL docs excluded
    assert _f(got[1]["char_entropy"]) == 0.0
    assert got[1]["n_chars"] == 4 and got[1]["distinct_chars"] == 1
    assert math.isclose(_f(got[2]["char_entropy"]), math.log(2),
                        rel_tol=1e-5)


def test_cluster_size_histogram_semantics(spark):
    from flink_descriptive_stats_spark.operators import dedup
    base = " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, base + " tail"),     # one 3-cluster
         (10, "entirely different content about something else here"),
         (11, "another unrelated unique document body entirely")],
        "doc_id long, text string")
    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"])
           for r in dedup.cluster_size_histogram(df).collect()}
    assert got == {3: (1, 3), 1: (2, 2)}


def test_weighted_sample_semantics(spark):
    from flink_descriptive_stats_spark.operators import sampling
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, 0.0).otherwise(0.5).alias("w"))
    kept = sampling.weighted_sample(df, "w").collect()
    ids = {r["doc_id"] for r in kept}
    assert not any(i < 1000 for i in ids)         # weight 0 -> never kept
    frac = len(ids) / 1000.0                      # weight .5 -> ~half kept
    assert 0.4 < frac < 0.6
    # deterministic: same input, same sample
    again = {r["doc_id"] for r in sampling.weighted_sample(df, "w").collect()}
    assert ids == again
    # weights outside [0,1] clamp rather than explode
    wild = df.withColumn("w", F.col("w") * 10)
    n = sampling.weighted_sample(wild, "w").count()
    assert n == 1000                              # clamped to keep-all


def test_profile_compare_semantics(spark):
    a = spark.createDataFrame([(float(i),) for i in range(100)],
                              "x double")
    b = spark.createDataFrame(
        [(float(i) + 10.0,) for i in range(100)] + [(None,)] * 100,
        "x double")
    r = extras.profile_compare(a, b, columns=["x"]).collect()[0]
    assert r["n_a"] == 100 and r["n_b"] == 100
    assert _f(r["null_rate_a"]) == 0.0
    assert math.isclose(_f(r["null_rate_b"]), 0.5, rel_tol=1e-5)
    # identical stddevs, mean shifted by 10 => shift = 10 / stddev
    sd = float(_f(r["stddev_a"]))
    assert math.isclose(_f(r["mean_shift_sigmas"]), 10.0 / sd,
                        rel_tol=1e-4)
    assert math.isclose(_f(r["null_rate_delta"]), 0.5, rel_tol=1e-5)


def test_ks_drift_semantics(spark):
    a = spark.createDataFrame([(float(i),) for i in range(100)],
                              "x double")
    # identical distributions: KS = 0
    r0 = extras.ks_drift(a, a, "x").collect()[0]
    assert _f(r0["ks_stat"]) == 0.0
    # disjoint supports: KS = 1
    b = spark.createDataFrame([(float(i) + 1000.0,) for i in range(50)],
                              "x double")
    r1 = extras.ks_drift(a, b, "x").collect()[0]
    assert r1["n_a"] == 100 and r1["n_b"] == 50
    assert _f(r1["ks_stat"]) == 1.0
    # half-shifted: exact rational sup survives the integer formulation
    c = spark.createDataFrame([(float(i) + 50.0,) for i in range(100)],
                              "x double")
    r2 = extras.ks_drift(a, c, "x").collect()[0]
    assert math.isclose(_f(r2["ks_stat"]), 0.5, rel_tol=1e-6)


def test_winsorize_semantics(spark):
    vals = [(float(i),) for i in range(1, 100)] + [(1e9,), (-1e9,), (None,)]
    df = spark.createDataFrame(vals, "x double")
    out = extras.winsorize(df, "x", lower=0.05, upper=0.95)
    rows = [r["x"] for r in out.collect()]
    assert sum(v is None for v in rows) == 1      # NULL passes through
    nn = [v for v in rows if v is not None]
    assert len(nn) == 101
    # the two injected extremes are clamped inside the percentile band
    assert max(nn) < 100.0 and min(nn) > -10.0
    # interior values untouched
    assert 50.0 in nn


def test_funnel_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1 completes the full ordered funnel
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # user 2 clicks BEFORE viewing: click must not count
        (2, "click", t(0)), (2, "view", t(1)),
        # user 3 views only
        (3, "view", t(0)),
        # user 4 purchases without any view: nothing counts
        (4, "purchase", t(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "ts timestamp")
    got = {r["step"]: r for r in ev_ops.funnel(df).collect()}
    assert got["view"]["n_users"] == 3
    assert got["click"]["n_users"] == 1       # only user 1's ordered click
    assert got["purchase"]["n_users"] == 1
    assert _f(got["view"]["pct_of_first"]) == 1.0
    assert math.isclose(_f(got["click"]["pct_of_prev"]), 1 / 3,
                        rel_tol=1e-5)
    assert _f(got["purchase"]["pct_of_prev"]) == 1.0


def test_retention_cohorts_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    base = dt.datetime(2024, 1, 1)          # a Monday
    wk = lambda w: base + dt.timedelta(weeks=w)
    rows = [
        (1, wk(0)), (1, wk(1)), (1, wk(2)),   # cohort 0, retained wk 1+2
        (2, wk(0)), (2, wk(2)),               # cohort 0, back in wk 2
        (3, wk(1)),                           # cohort 1, never returns
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["cohort_week"], r["week_offset"]):
           (r["n_active"], _f(r["retention_frac"]))
           for r in ev_ops.retention_cohorts(df).collect()}
    assert got[(base, 0)][0] == 2 and got[(base, 0)][1] == 1.0
    assert got[(base, 1)] == (1, 0.5)
    assert got[(base, 2)][0] == 2
    assert got[(wk(1), 0)] == (1, 1.0)
    assert (wk(1), 1) not in got


def test_resample_gapfill_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    rows = [(t(0, 10), 10.0), (t(0, 50), 20.0),   # bucket 0: avg 15
            (t(3, 5), 40.0)]                      # buckets 1-2 empty
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = sorted(ev_ops.resample(df, every_minutes=60).collect(),
                 key=lambda r: r["bucket_ts"])
    assert len(out) == 4                          # complete grid 0..3h
    assert out[0]["n"] == 2 and _f(out[0]["avg_val"]) == 15.0
    assert not out[0]["filled"]
    # gap buckets carried forward, flagged as filled
    for gap in out[1:3]:
        assert gap["n"] == 0 and gap["filled"]
        assert _f(gap["avg_val"]) == 15.0
    assert _f(out[3]["avg_val"]) == 40.0
    # fill="null" leaves the gaps NULL
    out2 = sorted(ev_ops.resample(df, every_minutes=60,
                                  fill="null").collect(),
                  key=lambda r: r["bucket_ts"])
    assert out2[1]["avg_val"] is None


def test_bigram_conditional_entropy_semantics(spark):
    # deterministic continuations (every token always followed by the
    # same next token) => H(next|prev) = 0
    det = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string")
    r = text_ops.bigram_conditional_entropy(det).collect()[0]
    assert _f(r["cond_entropy"]) == 0.0
    assert r["n_bigrams"] == 8 and r["n_distinct_bigrams"] == 3
    # 'a' followed by b/c equally => H = ln 2 weighted by p(prev='a')=1
    mixed = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a b"), (4, "a c")],
        "doc_id long, text string")
    r2 = text_ops.bigram_conditional_entropy(mixed).collect()[0]
    assert math.isclose(_f(r2["cond_entropy"]), math.log(2), rel_tol=1e-5)


def test_ks_and_entropy_property_vs_python(spark):
    """Property check vs an exact pure-Python mirror: on hypothesis-driven
    integer samples, ks_drift equals the exact rational KS statistic and
    column_entropy equals the direct -sum p ln p — the engine's rollup
    algebra (ln n - sum c ln c / n; integer sup formulation) introduces no
    drift beyond sig6 rendering."""
    from hypothesis import given, settings, strategies as st
    from flink_descriptive_stats_spark.functions.sig import sig6_py

    cases: list[tuple[list[int], list[int]]] = []

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(0, 9), min_size=1, max_size=30),
           st.lists(st.integers(0, 9), min_size=1, max_size=30))
    def gather(a, b):
        cases.append((a, b))

    gather()

    import math as m

    def py_ks(a, b):
        xs = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        sup = max(abs(sum(1 for v in a if v <= x) * nb
                      - sum(1 for v in b if v <= x) * na) for x in xs)
        return sup / (na * nb)

    def py_entropy(vals):
        from collections import Counter
        c = Counter(vals)
        n = len(vals)
        return -sum(k / n * m.log(k / n) for k in c.values())

    for a, b in cases[:12]:                  # 12 Spark jobs is plenty
        da = spark.createDataFrame([(float(v),) for v in a], "x double")
        db = spark.createDataFrame([(float(v),) for v in b], "x double")
        r = extras.ks_drift(da, db, "x").collect()[0]
        assert r["ks_stat"] == sig6_py(py_ks(a, b)), (a, b)
        e = {row["column"]: row
             for row in extras.column_entropy(da).collect()}["x"]
        assert e["entropy"] == sig6_py(py_entropy(a)), a


def test_robust_outliers_semantics(spark):
    # 99 values at 0..98 plus one absurd spike: the spike is the single
    # MAD outlier; an IQR dragged by it would still flag it, but a
    # constant column (MAD=0) must flag NOTHING
    vals = [(float(i), 5.0) for i in range(99)] + [(1e9, 5.0)]
    df = spark.createDataFrame(vals, "x double, c double")
    got = {r["column"]: r
           for r in extras.robust_outlier_counts(df).collect()}
    assert got["x"]["n_outliers"] == 1
    assert math.isclose(_f(got["x"]["median"]), 49.5, rel_tol=1e-5)
    assert got["c"]["n_outliers"] == 0 and _f(got["c"]["mad"]) == 0.0
    # all-NULL column: NULL stats, zero count
    nn = spark.createDataFrame([(None,)], "z double")
    r = extras.robust_outlier_counts(nn).collect()[0]
    assert r["median"] is None and r["n_outliers"] == 0


def test_fd_candidates_semantics(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "a"), (3, 20, "b"), (3, 20, "b"),
         (4, None, "c"), (5, None, "c")],
        "pk long, grp long, name string")
    got = {(r["determinant"], r["dependent"]): r
           for r in extras.fd_candidates(
               df, pairs=[("pk", "grp"), ("grp", "name"),
                          ("name", "pk")]).collect()}
    # pk -> grp holds (each pk maps to one grp; NULL grp is a value)
    assert got[("pk", "grp")]["fd_holds"] is True
    assert got[("pk", "grp")]["n_violations"] == 0
    # grp -> name holds too (10->a, 20->b, NULL->c)
    assert got[("grp", "name")]["fd_holds"] is True
    # name -> pk fails: 'a' maps to pks 1 and 2
    r = got[("name", "pk")]
    assert r["fd_holds"] is False and r["n_violations"] == 2


def test_check_constraints_semantics(spark):
    from flink_descriptive_stats_spark.operators import quality
    df = spark.createDataFrame(
        [(1, 0.05, "A"), (1, 0.20, "B"), (2, None, None), (3, 0.00, "A")],
        "k bigint, d double, s string")
    rules = [("not_null", "d"), ("unique", "k"),
             ("in_range", "d", 0.0, 0.1), ("matches", "s", "^[A-C]$"),
             ("in_set", "s", ("A", "C"))]
    got = {(r["rule"], r["column"]): r
           for r in quality.check_constraints(df, rules).collect()}
    assert all(r["n_rows"] == 4 for r in got.values())
    # one NULL d
    r = got[("not_null", "d")]
    assert r["n_violations"] == 1 and not r["passed"]
    # k = 1 twice -> one extra occurrence
    assert got[("unique", "k")]["n_violations"] == 1
    # 0.20 out of range; NULL d not double-counted
    assert got[("in_range[0.0,0.1]", "d")]["n_violations"] == 1
    # all present s match the regex
    rr = got[("matches[^[A-C]$]", "s")]
    assert rr["n_violations"] == 0 and rr["passed"]
    # "B" not in the allowed set; NULL skipped
    assert got[("in_set[A,C]", "s")]["n_violations"] == 1


def test_autocorrelation_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    # alternating series 1,-1,1,-1,... -> acf(1) = -1, acf(2) = +1 as
    # n -> inf; with n=8 the biased estimator gives -7/8 and 6/8
    rows = [("a", i, i, 1.0 if i % 2 == 0 else -1.0) for i in range(8)]
    df = spark.createDataFrame(
        rows, "event_type string, ts bigint, event_id bigint, value double")
    got = {r["lag"]: r for r in ev_ops.autocorrelation(
        df, max_lag=2).collect()}
    assert got[1]["n_pairs"] == 7 and got[2]["n_pairs"] == 6
    assert math.isclose(_f(got[1]["acf"]), -7 / 8, rel_tol=1e-5)
    assert math.isclose(_f(got[2]["acf"]), 6 / 8, rel_tol=1e-5)


def test_transition_matrix_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    # user 1: a->b->a ; user 2: a->b  => from 'a': {b:2}; from 'b': {a:1, b-end dropped}
    rows = [(1, 0, 1, "a"), (1, 1, 2, "b"), (1, 2, 3, "a"),
            (2, 0, 4, "a"), (2, 1, 5, "b")]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, event_type string")
    got = {(r["cur_type"], r["next_type"]): r
           for r in ev_ops.transition_matrix(df).collect()}
    assert got[("a", "b")]["n"] == 2
    assert math.isclose(_f(got[("a", "b")]["prob"]), 1.0, rel_tol=1e-5)
    assert got[("b", "a")]["n"] == 1
    assert math.isclose(_f(got[("b", "a")]["prob"]), 1.0, rel_tol=1e-5)
    assert len(got) == 2  # terminal events contribute no transition


def test_rollup_profile_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1, 5)
    t1 = dt.datetime(2026, 1, 2, 6)
    rows = [("a", t0, 1.0), ("a", t0, 3.0), ("b", t1, 5.0)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = ev_ops.rollup_profile(df).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    # 2 fine cells, 2 per-key subtotals, 1 grand total
    assert len(by_gid[0]) == 2 and len(by_gid[1]) == 2 and len(by_gid[3]) == 1
    cell = {(r["key"], r["day"]): r for r in by_gid[0]}
    a = cell[("a", "2026-01-01")]
    assert a["n"] == 2 and a["min_val"] == 1.0 and a["max_val"] == 3.0
    assert math.isclose(_f(a["avg_val"]), 2.0, rel_tol=1e-5)
    total = by_gid[3][0]
    assert total["key"] is None and total["day"] is None and total["n"] == 3


def test_typo_pairs_symspell_complete(spark):
    # the SymSpell delete-neighborhood blocking must find EVERY pair with
    # lev <= 2 that an exhaustive compare finds (candidate superset +
    # exact recheck), including substitution-only, insert, and transposed-
    # as-two-subs cases
    docs = [(1, "cat bat cart scat xyzzy cat"), (2, "chat cta frog")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {(r["token_a"], r["token_b"]): r["dist"]
           for r in text_ops.typo_pairs(df, max_dist=2).collect()}
    import itertools
    vocab = {"cat": 2, "bat": 1, "cart": 1, "scat": 1, "xyzzy": 1,
             "chat": 1, "cta": 1, "frog": 1}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {(a, b): lev(a, b) for a, b in
            itertools.combinations(sorted(vocab), 2) if lev(a, b) <= 2}
    assert got == want
    # counts ride through the blocking untouched
    row = [r for r in text_ops.typo_pairs(df, max_dist=1).collect()
           if (r["token_a"], r["token_b"]) == ("bat", "cat")][0]
    assert (row["n_a"], row["n_b"]) == (1, 2)


def test_semdedup_semantics(spark):
    from flink_descriptive_stats_spark.operators import similarity
    # ids 0,1 seed two orthogonal cells; 2 ~ cell0 near-dup of 0;
    # 3 ~ cell1 but below threshold; 4 near-dup of BOTH 0 and 2 -> dup_of
    # must be the smallest earlier neighbor (0)
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
            (2, [0.999, 0.01, 0.0]), (3, [0.5, 0.8, 0.0]),
            (4, [0.998, 0.02, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {r["vec_id"]: r for r in
           similarity.semdedup(df, threshold=0.95, n_cells=2).collect()}
    assert got[0]["kept"] and got[1]["kept"]
    assert not got[2]["kept"] and got[2]["dup_of"] == 0
    assert got[3]["kept"] and got[3]["cell_id"] == 1
    assert not got[4]["kept"] and got[4]["dup_of"] == 0
    assert got[2]["cell_id"] == 0 and got[4]["cell_id"] == 0


def test_trend_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    # series 'a': x = 2*hours + 1 exactly -> slope 2, intercept 1, r2 = 1
    rows = [("a", t0 + dt.timedelta(hours=h), 2.0 * h + 1.0)
            for h in range(5)]
    # series 'b': constant x -> slope 0, r2 NULL (varx = 0)
    rows += [("b", t0 + dt.timedelta(hours=h), 7.0) for h in range(3)]
    # series 'c': single point -> vart = 0 -> all NULL
    rows += [("c", t0, 1.0)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r["series"]: r for r in ev_ops.trend(df).collect()}
    assert math.isclose(_f(got["a"]["slope_per_hour"]), 2.0, rel_tol=1e-5)
    assert math.isclose(_f(got["a"]["intercept"]), 1.0, rel_tol=1e-5)
    assert math.isclose(_f(got["a"]["r2"]), 1.0, rel_tol=1e-5)
    assert _f(got["b"]["slope_per_hour"]) == 0.0
    assert got["b"]["r2"] is None
    assert got["c"]["slope_per_hour"] is None and got["c"]["n"] == 1


def test_lm_score_semantics(spark):
    from flink_descriptive_stats_spark.operators import text as t_ops
    # corpus: "a b" x3 and "a c" x1 -> V = 3, c(a,b)=3, c(a,c)=1, cp(a)=4
    docs = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "a")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in t_ops.lm_score(df).collect()}
    # doc 5 has no bigram -> absent
    assert set(got) == {1, 2, 3, 4}
    p_ab = (3 + 1) / (4 + 3)
    p_ac = (1 + 1) / (4 + 3)
    assert math.isclose(_f(got[1]["lm_score"]), -math.log(p_ab),
                        rel_tol=1e-5)
    assert math.isclose(_f(got[4]["lm_score"]), -math.log(p_ac),
                        rel_tol=1e-5)
    # predictable text scores LOWER cross-entropy than the rare variant
    assert _f(got[1]["lm_score"]) < _f(got[4]["lm_score"])
    assert got[1]["n_bigrams"] == 1


def test_histogram2d_semantics(spark):
    rows = [(0.0, 0.0), (0.0, 9.0), (9.0, 9.0), (9.0, 9.0),
            (None, 1.0), (5.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {(r["bx"], r["by"]): r["cnt"]
           for r in extras.histogram2d(df, "x", "y", bins=3).collect()}
    # max values land in the LAST bucket; null-in-either rows excluded
    assert got == {(0, 0): 1, (0, 2): 1, (2, 2): 2}


def test_histogram2d_constant_axis(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    got = {(r["bx"], r["by"]): r["cnt"]
           for r in extras.histogram2d(df, "x", "y", bins=4).collect()}
    # constant y collapses to bucket 0
    assert got == {(0, 0): 1, (3, 0): 1}


def test_lang_confusion_semantics(spark):
    docs = [(1, "the and of to is", "en"),      # predicted en, declared en
            (2, "der die das und ist", "en"),   # predicted de, declared en
            (3, "le la les et est", "fr")]      # predicted fr, declared fr
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    got = {(r["declared"], r["predicted"]): r
           for r in text_ops.lang_confusion(df).collect()}
    assert got[("en", "en")]["n"] == 1
    assert got[("en", "de")]["n"] == 1
    assert math.isclose(_f(got[("en", "de")]["share"]), 0.5, rel_tol=1e-5)
    assert math.isclose(_f(got[("fr", "fr")]["share"]), 1.0, rel_tol=1e-5)


def test_semdedup_max_cell_skew_guard(spark):
    from flink_descriptive_stats_spark.operators import similarity
    # all five vectors land in one cell; with the cap below the cell size
    # dup detection is skipped there (everything kept), with the default
    # cap the near-dups are caught
    rows = [(0, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [0.98, 0.02]),
            (3, [0.97, 0.03]), (4, [0.96, 0.04])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    capped = similarity.semdedup(df, threshold=0.9, n_cells=1, max_cell=3)
    assert all(r["kept"] for r in capped.collect())
    full = similarity.semdedup(df, threshold=0.9, n_cells=1)
    assert sum(not r["kept"] for r in full.collect()) == 4


def test_new_ops_partitioning_invariance(spark):
    """acf / transition_matrix / trend / lm_score must give identical
    results at 1 vs 64 input partitions: the window order keys are total
    (ts, id), and every FP statistic goes through sig6 so summation-order
    ULP noise cannot surface."""
    from flink_descriptive_stats_spark.operators import events as ev_ops
    from flink_descriptive_stats_spark.sources.tables import load_table
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for fn, df in ((lambda d: ev_ops.autocorrelation(d, max_lag=3), ev),
                   (ev_ops.transition_matrix, ev),
                   (ev_ops.trend, ev),
                   (text_ops.lm_score, docs),
                   (lambda d: text_ops.typo_pairs(d, max_dist=2), docs)):
        a = sorted(map(tuple, fn(df.coalesce(1)).collect()))
        b = sorted(map(tuple, fn(df.repartition(64)).collect()))
        assert a == b, fn


def test_acf_and_trend_property_vs_numpy(spark):
    """Statistical correctness on random series: ACF matches the numpy
    estimator and trend matches numpy.polyfit to float tolerance."""
    import numpy as np
    rng = np.random.RandomState(7)
    n = 200
    xs = rng.randn(n).cumsum()           # a correlated random walk
    rows = [("s", i, i, float(xs[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "event_type string, ts bigint, event_id bigint, value double")
    from flink_descriptive_stats_spark.operators import events as ev_ops
    got = {r["lag"]: _f(r["acf"])
           for r in ev_ops.autocorrelation(df, max_lag=4).collect()}
    mu = xs.mean()
    den = ((xs - mu) ** 2).sum()
    for k in range(1, 5):
        want = ((xs[k:] - mu) * (xs[:-k] - mu)).sum() / den
        assert abs(got[k] - want) < 1e-5, (k, got[k], want)

    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    rows2 = [("s", t0 + dt.timedelta(hours=i), float(xs[i]))
             for i in range(n)]
    df2 = spark.createDataFrame(rows2,
                                "event_type string, ts timestamp, value double")
    r = ev_ops.trend(df2).collect()[0]
    slope, intercept = np.polyfit(np.arange(n, dtype=float), xs, 1)
    assert abs(_f(r["slope_per_hour"]) - slope) < 1e-5 * max(1, abs(slope))
    assert abs(_f(r["intercept"]) - intercept) < 1e-4 * max(1, abs(intercept))
    corr = np.corrcoef(np.arange(n, dtype=float), xs)[0, 1]
    assert abs(_f(r["r2"]) - corr ** 2) < 1e-5


def test_doc_feature_vectors_semantics(spark):
    from flink_descriptive_stats_spark.functions.hashing import (
        _gen_minhash_params)  # noqa: F401  (import proves module path)
    import hashlib
    docs = [(1, "cat cat dog"), (2, ""), (3, None)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["id"]: r["v"]
           for r in text_ops.doc_feature_vectors(df, dim=8).collect()}

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 8

    want = [0.0] * 8
    want[bucket("cat")] += 2
    want[bucket("dog")] += 1
    assert got[1] == want
    assert got[2] == [0.0] * 8          # empty doc -> zero vector
    assert 3 not in got                 # NULL text excluded


def test_doc_clusters_groups_similar_docs(spark):
    # doc 0 and 1 seed the two cells; 2 shares vocabulary with 0, 3 with 1
    docs = [(0, "spark table join"), (1, "frog pond lily"),
            (2, "spark join spark table"), (3, "pond frog pond")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: r["cluster_id"]
           for r in text_ops.doc_clusters(df, k=2, dim=32).collect()}
    assert got[2] == got[0] == 0
    assert got[3] == got[1] == 1


def test_cluster_balanced_sample_semantics(spark):
    from flink_descriptive_stats_spark.operators import sampling
    # 2 clusters with 5 docs each; k=2 per cluster -> exactly 4 rows,
    # 2 per cluster, deterministic across reruns
    docs = ([(i, "spark table join scan") for i in range(0, 5)]
            + [(i, "frog pond lily leaf") for i in range(5, 10)])
    # seed doc 1 must anchor the second cluster: make doc ids 0 and 1
    # vocabulary-distinct
    docs[1] = (1, "frog pond lily leaf")
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = sampling.cluster_balanced_sample(df, k_per_cluster=2,
                                           n_clusters=2, dim=32).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    assert sorted(len(v) for v in by_cluster.values()) == [2, 2]
    again = sampling.cluster_balanced_sample(df, k_per_cluster=2,
                                             n_clusters=2, dim=32).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_profile_wide_schema_codegen_fallback(spark):
    """120-column profile: the aggregate bundle exceeds whole-stage
    codegen's method/field limits, forcing Spark's interpreted/split
    fallback — values must be identical to the narrow path. Pins the
    wide-table correctness the 64KB-codegen gotcha note warns about."""
    from flink_descriptive_stats_spark.operators import profile as prof
    n_cols = 120
    df = spark.range(500).select(
        *[(F.col("id") * (i + 1)).cast("double").alias(f"c{i}")
          for i in range(n_cols)])
    out = {r["column"]: r for r in prof.profile(df).collect()}
    assert len(out) == n_cols
    # spot-check against closed forms: c_i = (i+1) * (0..499)
    for i in (0, 59, 119):
        r = out[f"c{i}"]
        assert r["row_count"] == 500
        assert r["null_count"] == 0
        assert _f(r["min_val"]) == 0.0
        assert _f(r["max_val"]) == float((i + 1) * 499)
        assert abs(_f(r["mean"]) - (i + 1) * 249.5) < 1e-3 * (i + 1)


def test_null_pattern_report_semantics(spark):
    rows = [(1, None), (2, None), (3, 3.0), (None, None)]
    df = spark.createDataFrame(rows, "a bigint, b double")
    got = {r["pattern"]: r for r in
           extras.null_pattern_report(df, ["a", "b"]).collect()}
    assert got["01"]["n"] == 2
    assert got["00"]["n"] == 1 and got["11"]["n"] == 1
    assert abs(_f(got["01"]["pct"]) - 0.5) < 1e-6


def test_event_paths_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    # user 1: a,b,c,b,c ; user 2: a,b,c  — trigrams: abc x2, bcb, cbc
    seq1 = ["a", "b", "c", "b", "c"]
    rows = [(1, i, i, t) for i, t in enumerate(seq1)]
    rows += [(2, i, 10 + i, t) for i, t in enumerate(["a", "b", "c"])]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, event_type string")
    got = {r["path"]: r for r in ev_ops.event_paths(df, depth=3).collect()}
    assert got["a>b>c"]["n"] == 2 and got["a>b>c"]["rank"] == 1
    assert got["b>c>b"]["n"] == 1 and got["c>b>c"]["n"] == 1
    assert len(got) == 3   # sequences never cross user boundaries


def test_spearman_semantics(spark):
    # y = x^3 is monotone-nonlinear: Spearman rho must be exactly 1 while
    # Pearson is < 1; z is a tied column exercising the average-rank policy
    rows = [(float(i), float(i) ** 3, float(i // 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r["col_a"], r["col_b"]): _f(r["rho"])
           for r in extras.spearman_matrix(df, ["x", "y", "z"]).collect()}
    assert abs(got[("x", "y")] - 1.0) < 1e-6
    pearson = {(r["col_a"], r["col_b"]): _f(r["corr"])
               for r in extras.correlation_matrix(df, ["x", "y"]).collect()}
    assert pearson[("x", "y")] < 0.999
    # tied column: still a valid rho in [-1, 1], matches scipy's value
    import numpy as np
    from numpy import corrcoef

    def avg_ranks(v):
        v = np.asarray(v)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=float)
        sorted_v = v[order]
        i = 0
        while i < len(v):
            j = i
            while j < len(v) and sorted_v[j] == sorted_v[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    xs = [r[0] for r in rows]
    zs = [r[2] for r in rows]
    want = corrcoef(avg_ranks(xs), avg_ranks(zs))[0, 1]
    assert abs(got[("x", "z")] - want) < 1e-6


def test_woe_iv_semantics(spark):
    import math as m
    # feature perfectly separates the label across two bins
    rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y int")
    got = {r["bin"]: r for r in extras.woe_iv(df, "x", "y", bins=2).collect()}
    # bin 0: x in [0, 4.5) -> 5 rows all neg; bin 1: 5 rows all pos
    assert got[0]["n"] == 5 and got[0]["n_pos"] == 0
    assert got[1]["n"] == 5 and got[1]["n_pos"] == 5
    ps0, ns0 = 0.5 / 5.5, 5.5 / 5.5
    assert abs(_f(got[0]["woe"]) - m.log(ps0 / ns0)) < 1e-5
    assert _f(got[0]["woe"]) < 0 < _f(got[1]["woe"])
    # iv terms positive for informative bins
    assert _f(got[0]["iv_term"]) > 0 and _f(got[1]["iv_term"]) > 0


def test_funnel_conversion_window(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1, 12, 0)
    mk = lambda mins: t0 + dt.timedelta(minutes=mins)
    rows = [
        # user 1 converts inside the 60-min window
        (1, "view", mk(0)), (1, "click", mk(10)), (1, "purchase", mk(50)),
        # user 2's purchase lands after the deadline (90 > 60)
        (2, "view", mk(0)), (2, "click", mk(20)), (2, "purchase", mk(90)),
        # user 3's click is already outside -> neither step counts
        (3, "view", mk(0)), (3, "click", mk(70)), (3, "purchase", mk(80)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    out = {r["step"]: r["n_users"]
           for r in ev_ops.funnel(df, within_minutes=60).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}
    # without the window everyone converts
    full = {r["step"]: r["n_users"] for r in ev_ops.funnel(df).collect()}
    assert full == {"view": 3, "click": 3, "purchase": 3}


def test_seasonality_profile_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    # Mon 2026-01-05 09:xx twice (values 1, 3), Tue 14:xx once (value 5)
    rows = [(dt.datetime(2026, 1, 5, 9, 0), 1.0),
            (dt.datetime(2026, 1, 5, 9, 30), 3.0),
            (dt.datetime(2026, 1, 6, 14, 0), 5.0)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {(r["dimension"], r["bucket"]): r
           for r in ev_ops.seasonality_profile(df).collect()}
    assert got[("hour_of_day", 9)]["n"] == 2
    assert abs(_f(got[("hour_of_day", 9)]["avg_val"]) - 2.0) < 1e-6
    assert got[("day_of_week", 1)]["n"] == 2      # Monday = 1
    assert got[("day_of_week", 2)]["n"] == 1      # Tuesday = 2
    assert got[("hour_of_day", 14)]["n"] == 1


def test_cusum_changepoint_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    # series 'a': mean 0 for 10 buckets then mean 10 for 10 buckets —
    # |CUSUM| peaks exactly at the shift boundary and clears 5*sd(means)?
    # sd of bucket means here is 5, threshold 25, peak |S| = 50 -> shifted
    rows = [("a", t0 + dt.timedelta(hours=6 * i), 0.0 if i < 10 else 10.0)
            for i in range(20)]
    # series 'b': constant -> peak 0, sd 0, not shifted
    rows += [("b", t0 + dt.timedelta(hours=6 * i), 7.0) for i in range(20)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r["series"]: r for r in ev_ops.cusum_changepoint(df).collect()}
    a = got["a"]
    assert a["n_buckets"] == 20 and a["shifted"]
    assert abs(abs(_f(a["peak_cusum"])) - 50.0) < 1e-3
    # the peak sits at the last pre-shift bucket (index 9)
    assert a["peak_bucket_ts"] == t0 + dt.timedelta(hours=54)
    assert not got["b"]["shifted"]


def test_js_drift_semantics(spark):
    import math as m
    # identical snapshots -> JSD exactly 0 in every bucket
    a = spark.createDataFrame([(float(i),) for i in range(20)], "x double")
    same = {r["bucket"]: _f(r["jsd_term"])
            for r in extras.js_drift(a, a, "x", bins=4).collect()}
    assert all(abs(v) < 1e-12 for v in same.values())
    # disjoint supports -> total JSD = ln 2 (the upper bound)
    b = spark.createDataFrame([(float(i),) for i in range(100, 120)],
                              "x double")
    total = sum(_f(r["jsd_term"])
                for r in extras.js_drift(a, b, "x", bins=4).collect())
    assert abs(total - m.log(2)) < 1e-6   # sig6 = 7 significant digits
    # one-sided buckets contribute exactly p/2 * ln 2 with no epsilon
    rows = {r["bucket"]: r for r in
            extras.js_drift(a, b, "x", bins=4).collect()}
    over = rows[4]                      # the +inf overflow bucket: only B
    assert over["n_a"] == 0 and over["n_b"] == 20
    assert abs(_f(over["jsd_term"]) - m.log(2) / 2) < 1e-6


def test_embedding_diversity_identity(spark):
    import itertools
    import numpy as np
    from flink_descriptive_stats_spark.operators import similarity
    rng = np.random.RandomState(3)
    vs = rng.randn(30, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id bigint, embedding array<double>")
    r = similarity.embedding_diversity(df).collect()[0]
    # brute-force mean pairwise cosine must match the O(n) identity
    un = vs / np.linalg.norm(vs, axis=1, keepdims=True)
    pairs = [float(un[i] @ un[j])
             for i, j in itertools.combinations(range(len(vs)), 2)]
    want = sum(pairs) / len(pairs)
    assert abs(_f(r["mean_pairwise_cos"]) - want) < 1e-5
    assert r["n"] == 30 and r["dim"] == 8


def test_embedding_drift_semantics(spark):
    from flink_descriptive_stats_spark.operators import similarity
    # identical snapshots -> centroid cosine exactly 1
    rows = [(i, [1.0, float(i % 3)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = similarity.embedding_drift(df, df).collect()[0]
    assert abs(_f(r["centroid_cos"]) - 1.0) < 1e-6
    # orthogonal centroids -> cosine 0
    a = spark.createDataFrame([(0, [1.0, 0.0]), (1, [1.0, 0.0])],
                              "vec_id bigint, embedding array<double>")
    b = spark.createDataFrame([(0, [0.0, 1.0]), (1, [0.0, 2.0])],
                              "vec_id bigint, embedding array<double>")
    r2 = similarity.embedding_drift(a, b).collect()[0]
    assert abs(_f(r2["centroid_cos"])) < 1e-9
    assert r2["n_a"] == 2 and r2["n_b"] == 2


def test_latest_by_key_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    rows = [(1, 10, 1, "a"), (1, 20, 2, "b"),       # user 1: latest = b
            (2, 5, 3, "c"), (2, 5, 4, "d")]         # tie on ts: max id wins
    df = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, event_type string")
    got = {r["user_id"]: r["event_type"]
           for r in ev_ops.latest_by_key(df).collect()}
    assert got == {1: "b", 2: "d"}


def test_pareto_share_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    # 10 users: one whale holds 91 of 100 total value
    rows = [(0, 91.0)] + [(i, 1.0) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "user_id bigint, value double")
    got = {r["top_pct"]: r for r in ev_ops.pareto_share(
        df, checkpoints=(10, 50)).collect()}
    assert got[10]["n_top_keys"] == 1
    assert abs(_f(got[10]["value_share"]) - 0.91) < 1e-6
    assert got[50]["n_top_keys"] == 5
    assert abs(_f(got[50]["value_share"]) - 0.95) < 1e-6


def test_lm_score_property_vs_python(spark):
    """Random corpora: lm_score matches a pure-Python mirror of the add-1
    bigram model to sig6 precision (tokenizer, smoothing, and nats all
    pinned)."""
    import math as m
    import random
    rng = random.Random(5)
    words = ["ab", "cd", "ef", "gh", "ij"]
    docs = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randint(0, 8))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: (_f(r["lm_score"]), r["n_bigrams"])
           for r in text_ops.lm_score(df).collect()}

    toks = {i: t.split() for i, t in docs}
    bc: dict = {}
    pc: dict = {}
    vocab = set()
    for t in toks.values():
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
            pc[a] = pc.get(a, 0) + 1
    V = len(vocab)
    for i, t in toks.items():
        bgs = list(zip(t, t[1:]))
        if not bgs:
            assert i not in got
            continue
        want = -sum(m.log((bc[(a, b)] + 1) / (pc[a] + V))
                    for a, b in bgs) / len(bgs)
        score, nbg = got[i]
        assert nbg == len(bgs)
        assert abs(score - want) < 1e-5 * max(1.0, abs(want)), (i, score,
                                                                want)


def test_audio_spectral_features_pure_tone(spark):
    """A synthesized pure tone must show centroid/dominant frequency at
    the tone; white-ish noise must show a much higher bandwidth. Real
    numpy-rFFT DSP over the real WAV decoder — no stubs in this path."""
    import struct as st
    import numpy as np
    from flink_descriptive_stats_spark.operators import multimodal

    def wav(samples: np.ndarray, rate: int = 8000) -> bytes:
        pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        fmt = st.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        return (b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
                + b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", len(pcm)) + pcm)

    rate, n = 8000, 2048
    t = np.arange(n) / rate
    tone = np.sin(2 * np.pi * 1000.0 * t)          # 1 kHz
    rng = np.random.RandomState(0)
    noise = rng.uniform(-0.5, 0.5, n)
    rows = [(1, bytearray(wav(tone))), (2, bytearray(wav(noise))),
            (3, bytearray(b"not a wav"))]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    got = {r["id"]: r for r in
           multimodal.audio_spectral_features(df, n_fft=1024).collect()}
    tone_r = got[1]
    assert tone_r["decoded"]
    assert abs(tone_r["dominant_freq_hz"] - 1000.0) < 8000 / 1024 + 1e-9
    assert abs(tone_r["spectral_centroid_hz"] - 1000.0) < 120
    assert tone_r["spectral_bandwidth_hz"] < 400
    noise_r = got[2]
    assert noise_r["spectral_bandwidth_hz"] > \
        2 * tone_r["spectral_bandwidth_hz"]
    assert not got[3]["decoded"]


def test_image_texture_features_semantics(spark):
    """Flat fill vs checkerboard, numpy ground truth: the checkerboard
    must show high edge density / entropy ~1 bit; the flat image zero
    gradients and zero entropy."""
    import numpy as np
    from flink_descriptive_stats_spark.operators import multimodal

    def ppm(img: np.ndarray) -> bytes:
        h, w, _ = img.shape
        return (f"P6\n{w} {h}\n255\n".encode()
                + img.astype(np.uint8).tobytes())

    flat = np.full((16, 16, 3), 128)
    # width-2 vertical stripes (period 4): central differences see the
    # transitions (a period-2 checkerboard would cancel to zero in the
    # interior — classic finite-difference aliasing)
    stripes = np.zeros((16, 16, 3))
    stripes[:, (np.arange(16) // 2) % 2 == 1] = 255
    rows = [(1, bytearray(ppm(flat))), (2, bytearray(ppm(stripes))),
            (3, bytearray(b"JFIF..."))]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    got = {r["id"]: r for r in
           multimodal.image_texture_features(df).collect()}
    f, c = got[1], got[2]
    assert f["decoded"] and f["edge_density"] == 0.0
    assert f["luma_entropy"] == 0.0 and f["luma_contrast"] == 0.0
    assert c["edge_density"] > 0.3        # stripe boundaries
    assert 0.9 < c["luma_entropy"] < 1.1  # two equiprobable luma values
    assert c["luma_contrast"] > 100
    assert not got[3]["decoded"]


def test_typo_pairs_randomized_vs_exhaustive(spark):
    """Randomized SymSpell completeness: on random short words over a
    small alphabet (dense distance-1/2 structure), the blocked join must
    find EXACTLY the pairs an exhaustive O(V^2) Python compare finds."""
    import itertools
    import random

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    rng = random.Random(17)
    for trial in range(3):
        vocab = {"".join(rng.choice("abc")
                         for _ in range(rng.randint(1, 5)))
                 for _ in range(25)}
        docs = [(i, w) for i, w in enumerate(sorted(vocab))]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {(r["token_a"], r["token_b"]): r["dist"]
               for r in text_ops.typo_pairs(df, max_dist=2).collect()}
        want = {(a, b): lev(a, b)
                for a, b in itertools.combinations(sorted(vocab), 2)
                if lev(a, b) <= 2}
        assert got == want, (trial, got.keys() ^ want.keys())


def test_readability_semantics(spark):
    docs = [(1, "The cat sat. The dog ran away!"),
            (2, "incomprehensibility notwithstanding"),   # long words
            (3, "")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["id"]: r for r in text_ops.readability(df).collect()}
    r1 = got[1]
    assert r1["n_words"] == 7
    # vowel groups: e,a,a | e,o,a,a,ay -> 8 total
    assert r1["n_syllables"] == 8
    assert abs(_f(r1["words_per_sentence"]) - 3.5) < 1e-6
    # simple text scores HIGHER flesch than long-word jargon
    assert _f(got[1]["flesch"]) > _f(got[2]["flesch"])
    assert _f(got[2]["long_word_ratio"]) == 1.0
    # empty doc: counts 0, ratios NULL
    assert got[3]["n_words"] == 0 and got[3]["flesch"] is None


def test_charset_audit_semantics(spark):
    docs = [(1, "plain ascii text"),
            (2, "café naïve résumé"),
            (3, "bad\x01control"),
            (4, "lost�bytes"),
            (5, "中文文本")]     # all non-ascii
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["id"]: r for r in text_ops.charset_audit(df).collect()}
    assert got[1]["n_non_ascii"] == 0 and not got[1]["suspect"]
    assert got[2]["n_non_ascii"] == 4 and not got[2]["suspect"]
    assert got[3]["n_control"] == 1 and got[3]["suspect"]
    assert got[4]["n_replacement"] == 1 and got[4]["suspect"]
    assert got[5]["suspect"]              # >30% non-ascii


def test_approx_paths_measured_accuracy(spark):
    """The documented scale paths carry measured accuracy bars, not just
    claims: HLL++ distinct within 3x its configured rsd on every lineitem
    column, and GK approximate quartiles within 2% relative of exact on
    the skewed continuous columns."""
    from flink_descriptive_stats_spark.sources.tables import load_table
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_extendedprice"]

    exact = {r["column"]: r["distinct_count"] for r in
             extras.distinct_counts(li, columns=cols,
                                    exact=True).collect()}
    approx = {r["column"]: r["approx_distinct_count"] for r in
              extras.approx_distinct_counts(li, rsd=0.05,
                                            columns=cols).collect()}
    for c in cols:
        rel = abs(approx[c] - exact[c]) / exact[c]
        assert rel < 0.15, (c, exact[c], approx[c])

    qe = {r["column"]: r for r in
          extras.quantiles(li, columns=["l_extendedprice"],
                           exact=True).collect()}
    qa = {r["column"]: r for r in
          extras.quantiles(li, columns=["l_extendedprice"],
                           exact=False).collect()}
    for q in ("q_25", "q_50", "q_75"):
        e = _f(qe["l_extendedprice"][q])
        a = _f(qa["l_extendedprice"][q])
        assert abs(a - e) / abs(e) < 0.02, (q, e, a)


def test_collocations_semantics(spark):
    import math as m
    # "new york" always co-occurs (a true phrase); "the" also appears
    # in unrelated contexts, so its pairs carry lower PMI
    docs = [(i, "new york the cat") if i % 2 == 0
            else (i, "new york the dog") for i in range(10)]
    docs += [(100 + i, "the fish") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {(r["token_a"], r["token_b"]): r
           for r in text_ops.collocations(df, min_count=3, k=10).collect()}
    ny = got[("new", "york")]
    assert ny["n_pair"] == 10 and ny["rank"] == 1
    # exact PMI: 34 bigrams, 48 tokens; p(new,york)=10/34,
    # p(new)=p(york)=10/48
    want = m.log((10 / 34) / ((10 / 48) * (10 / 48)))
    assert abs(_f(ny["pmi"]) - want) < 1e-5
    assert _f(ny["pmi"]) > _f(got[("the", "cat")]["pmi"])
    # rare pairs below min_count never appear
    assert all(r["n_pair"] >= 3 for r in got.values())


def test_schema_suggestions_semantics(spark):
    # NOTE the bools fixture is all-"true": the suggestion reuses the
    # PROFILE's reference-faithful counter (Boolean.parseBoolean quirk —
    # only "true" increments, StatsPojo.java:306-313), so a true/false
    # column correctly stays string under that contract
    df = spark.createDataFrame(
        [("1", "true", "2024-01-02", "1", None),
         ("22", "TRUE", "2024-02-03", "x", None),
         ("-3", "true", "2024-12-31", "2", None)],
        "ints string, bools string, dates string, mixed string, "
        "allnull string")
    got = {r["column"]: r for r in
           extras.schema_suggestions(df).collect()}
    assert got["ints"]["suggested_type"] == "bigint"
    assert got["bools"]["suggested_type"] == "boolean"
    assert got["dates"]["suggested_type"] == "date"
    # partial parses stay string, best candidate's share reported
    m = got["mixed"]
    assert m["suggested_type"] == "string"
    assert abs(_f(m["parse_rate"]) - 2 / 3) < 1e-5
    # all-NULL column: no evidence, no suggestion
    assert got["allnull"]["suggested_type"] == "string"
    assert got["allnull"]["parse_rate"] is None
    # a non-string-typed frame yields an empty report
    num = spark.createDataFrame([(1,)], "x bigint")
    assert extras.schema_suggestions(num).count() == 0


def test_check_constraints_by_semantics(spark):
    from flink_descriptive_stats_spark.operators import quality
    df = spark.createDataFrame(
        [("a", 1, 0.5), ("a", 1, 2.0), ("b", 2, 0.1), ("b", None, 0.2)],
        "src string, k bigint, v double")
    rules = [("not_null", "k"), ("unique", "k"),
             ("in_range", "v", 0.0, 1.0)]
    got = {(r["group"], r["rule"]): r for r in
           quality.check_constraints_by(df, rules, "src").collect()}
    # group a: k duplicated, one v out of range, no nulls
    assert got[("a", "unique")]["n_violations"] == 1
    assert got[("a", "in_range[0.0,1.0]")]["n_violations"] == 1
    assert got[("a", "not_null")]["passed"]
    # group b: one null k, unique among present values, all v in range
    assert got[("b", "not_null")]["n_violations"] == 1
    assert got[("b", "unique")]["passed"]
    assert got[("b", "in_range[0.0,1.0]")]["passed"]
    assert all(r["n_rows"] == 2 for r in got.values())


def test_type_affinity_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    # 4 users: a+b always together (perfect attraction), a+c never
    # co-occur (repulsion); c alone for two users
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
            (3, "c"), (4, "c"), (3, "d"), (1, "a")]   # dup event ignored
    df = spark.createDataFrame(rows, "user_id bigint, event_type string")
    got = {(r["type_a"], r["type_b"]): r
           for r in ev_ops.type_affinity(df).collect()}
    ab = got[("a", "b")]
    # P(a)=P(b)=2/4, P(a,b)=2/4 -> lift = 0.5/(0.5*0.5) = 2
    assert ab["n_both"] == 2
    assert abs(_f(ab["support"]) - 0.5) < 1e-6
    assert abs(_f(ab["lift"]) - 2.0) < 1e-6
    assert ("a", "c") not in got          # never co-occur: no row
    cd = got[("c", "d")]
    # P(c)=2/4, P(d)=1/4, P(c,d)=1/4 -> lift = 2
    assert abs(_f(cd["lift"]) - 2.0) < 1e-6


def test_histogram_log_semantics(spark):
    # span 1..10^4 with bins=4 -> decade bins; probe values sit in bin
    # INTERIORS (exact decade boundaries land on FP floor edges — either
    # side is consistent across engines but brittle to assert);
    # non-positive values land in bucket -1
    rows = [(1.0,), (2.0,), (20.0,), (200.0,), (2000.0,), (10000.0,),
            (0.0,), (-5.0,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    got = {r["bucket"]: r for r in
           extras.histogram_log(df, "x", bins=4).collect()}
    assert got[-1]["cnt"] == 2 and got[-1]["lo"] is None
    # min + its decade-mate in bucket 0; the max joins bucket 3
    assert got[0]["cnt"] == 2
    assert got[1]["cnt"] == 1 and got[2]["cnt"] == 1
    assert got[3]["cnt"] == 2
    # bucket 1 covers [10, 100): bounds are exact decades
    assert abs(_f(got[1]["lo"]) - 10.0) < 1e-3
    assert abs(_f(got[1]["hi"]) - 100.0) < 1e-2


def test_percentile_rank_transform_semantics(spark):
    rows = [(1, 10.0), (2, 20.0), (3, 20.0), (4, 40.0), (5, None)]
    df = spark.createDataFrame(rows, "event_id bigint, value double")
    got = {r["id"]: _f(r["pct_rank"]) for r in
           extras.percentile_rank_transform(
               df, "value", "event_id").collect()}
    # (rank-1)/(n-1) with ties sharing the min rank: n=4
    assert got[1] == 0.0
    assert abs(got[2] - 1 / 3) < 1e-6 and got[2] == got[3]  # tie
    assert got[4] == 1.0
    assert 5 not in got                    # NULL excluded


def test_interarrival_profile_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    # user 1: perfectly periodic 60s gaps -> burstiness -1
    rows = [(1, t0 + dt.timedelta(seconds=60 * i), i) for i in range(5)]
    # user 2 contributes one 120s gap
    rows += [(2, t0, 100), (2, t0 + dt.timedelta(seconds=120), 101)]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint")
    r = ev_ops.interarrival_profile(df).collect()[0]
    assert r["n_deltas"] == 5            # 4 from user 1 + 1 from user 2
    assert abs(_f(r["mean_s"]) - 72.0) < 1e-6     # (60*4 + 120) / 5
    assert abs(_f(r["p50_s"]) - 60.0) < 1e-6
    assert r["max_s"] == 120.0
    # sd = 24, mean = 72 -> burstiness = (24-72)/(24+72) = -0.5
    assert abs(_f(r["burstiness"]) + 0.5) < 1e-6
    # a single periodic user alone: sd = 0 -> burstiness exactly -1
    solo = ev_ops.interarrival_profile(
        df.where(F.col("user_id") == 1)).collect()[0]
    assert abs(_f(solo["burstiness"]) + 1.0) < 1e-9


def test_late_arrival_audit_semantics(spark):
    from flink_descriptive_stats_spark.operators import events as ev_ops
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    sec = lambda x: t0 + dt.timedelta(seconds=x)
    # arrival order (event_id): ts goes 0, 100, 40, 200 — event 3 arrives
    # 60s late relative to the running max
    rows = [(1, sec(0)), (2, sec(100)), (3, sec(40)), (4, sec(200))]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    r = ev_ops.late_arrival_audit(df).collect()[0]
    assert r["n_pairs"] == 3 and r["n_late"] == 1
    assert r["max_lateness_s"] == 60.0
    assert abs(_f(r["late_rate"]) - 1 / 3) < 1e-6
    # fully ordered feed: zero lateness everywhere
    ordered = spark.createDataFrame(
        [(i, sec(10 * i)) for i in range(5)], "event_id bigint, ts timestamp")
    r2 = ev_ops.late_arrival_audit(ordered).collect()[0]
    assert r2["n_late"] == 0 and r2["max_lateness_s"] == 0.0


def test_join_cardinality_estimate_semantics(spark):
    from flink_descriptive_stats_spark.operators import joins
    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "ka bigint")
    b = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (9,)], "kb bigint")
    r = joins.join_cardinality_estimate(a, b, "ka", "kb").collect()[0]
    assert r["n_left"] == 4 and r["n_right"] == 5   # NULL key excluded
    assert r["n_keys_left"] == 3 and r["n_keys_right"] == 3
    assert r["n_keys_common"] == 2                  # keys 1 and 2
    # est = 2*3 (key 1) + 1*1 (key 2) = 7 — verify against the real join
    assert r["est_rows"] == 7
    assert r["max_key_fanout"] == 6
    real = a.join(b, a["ka"] == b["kb"]).count()
    assert real == r["est_rows"]
