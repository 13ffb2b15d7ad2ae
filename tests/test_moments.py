"""Property tests: profile moments vs numpy golden formulas (SURVEY.md §5.2),
edge cases (n in {0,1,2}, constant columns), and partitioning invariance
(SURVEY.md §5.4 — catches merge bugs like the reference's lost type counters).
"""

import math

import numpy as np
import pytest
from pyspark.sql import types as T

from flink_descriptive_stats_spark.operators.profile import profile


def _parse(s):
    """Parse the engine's '<mantissa>e<exp>' sig6 rendering."""
    if s is None:
        return None
    return float(s.replace("e", "E"))


def _row(df, col):
    return {r["column"]: r for r in df.collect()}[col]


def _mk_df(spark, values, dtype=T.DoubleType()):
    schema = T.StructType([T.StructField("x", dtype, True)])
    return spark.createDataFrame([(v,) for v in values], schema)


def _np_expected(x, row_count):
    """Golden formulas per StatsPojo.java:173-290 / ProfileJob.java:146-162."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    out = {"numeric_count": n}
    if n == 0:
        return out
    mu = x.mean()
    m2 = ((x - mu) ** 2).sum()
    m3 = ((x - mu) ** 3).sum()
    m4 = ((x - mu) ** 4).sum()
    out["mean"] = mu
    out["var_pop"] = m2 / n
    out["stddev_pop"] = math.sqrt(m2 / n)
    skew_pop = 0.0 if m2 == 0 else (m3 / n) / (m2 / n) ** 1.5
    kurt_pop = 0.0 if m2 == 0 else (m4 / n) / (m2 / n) ** 2
    out["skew_pop"] = skew_pop
    out["kurt_pop"] = kurt_pop
    out["skew_samp"] = 0.0 if n <= 1 else skew_pop * n / (n - 1)
    out["kurt_samp"] = 0.0 if n <= 1 else kurt_pop * n / (n - 1)
    if n >= 2:
        out["var_samp"] = m2 / (n - 1)
        s = math.sqrt(m2 / (n - 1))
        out["stddev_samp"] = s
        out["se_mean"] = s / math.sqrt(n)
        out["se_var"] = (m2 / (n - 1)) * math.sqrt(2.0 / (n - 1))
        out["se_stddev"] = s / math.sqrt(2.0 * (n - 1))
    if n >= 3:
        out["se_skew"] = math.sqrt(6.0 * n * (n - 1)
                                   / ((n - 2) * (n + 1) * (n + 3)))
    if n >= 4:
        out["se_kurt"] = (2 * out["se_skew"]
                          * math.sqrt((n * n - 1) / ((n - 3.0) * (n + 5))))
    out["jb_score"] = (n / 6.0) * (out["skew_samp"] ** 2
                                   + 0.25 * (out["kurt_samp"] - 3.0) ** 2)
    return out


def _check(row, expected):
    for key, want in expected.items():
        got = row[key]
        if isinstance(got, str):
            got = _parse(got)
        if want is None:
            assert got is None, key
        elif isinstance(want, int):
            assert got == want, key
        else:
            assert got == pytest.approx(want, rel=1e-5, abs=1e-12), \
                f"{key}: got {got} want {want}"


@pytest.mark.parametrize("seed,dist", [(1, "normal"), (2, "lognormal"),
                                       (3, "uniform"), (4, "negative")])
def test_moments_vs_numpy(spark, seed, dist):
    rng = np.random.default_rng(seed)
    n = 5000
    if dist == "normal":
        x = rng.normal(10, 3, n)
    elif dist == "lognormal":
        x = rng.lognormal(1, 1, n)  # strong skew
    elif dist == "uniform":
        x = rng.uniform(-5, 5, n)
    else:
        x = -rng.lognormal(0.5, 1, n)  # negative-skewed negatives
    df = _mk_df(spark, [float(v) for v in x])
    row = _row(profile(df), "x")
    _check(row, _np_expected(x, n))
    assert row["min_val"] == x.min() and row["max_val"] == x.max()


def test_all_null_column(spark):
    df = _mk_df(spark, [None] * 10)
    row = _row(profile(df), "x")
    assert row["row_count"] == 10 and row["null_count"] == 10
    assert row["numeric_count"] == 0
    for k in ("min_val", "max_val", "mean", "var_pop", "var_samp",
              "skew_pop", "kurt_pop", "jb_score", "scott_bin_width"):
        assert row[k] is None, k


def test_single_value(spark):
    df = _mk_df(spark, [42.0])
    row = _row(profile(df), "x")
    assert row["numeric_count"] == 1
    assert _parse(row["mean"]) == 42.0
    assert _parse(row["var_pop"]) == 0.0
    assert row["var_samp"] is None          # NULL, not div-by-zero Inf
    assert _parse(row["skew_pop"]) == 0.0   # M2==0 guard
    assert _parse(row["skew_samp"]) == 0.0  # n<=1 guard
    assert _parse(row["kurt_samp"]) == 0.0
    # JB with sample skew/kurt both 0: (1/6)*(0 + 0.25*9) = 0.375
    assert _parse(row["jb_score"]) == pytest.approx(0.375)


def test_constant_column(spark):
    df = _mk_df(spark, [7.5] * 100)
    row = _row(profile(df), "x")
    assert _parse(row["var_pop"]) == 0.0
    assert _parse(row["skew_pop"]) == 0.0
    assert _parse(row["kurt_pop"]) == 0.0   # reference M2==0 guard -> 0.0
    assert _parse(row["kurt_excess_pop"]) == -3.0


def test_two_values(spark):
    df = _mk_df(spark, [1.0, 3.0])
    row = _row(profile(df), "x")
    assert _parse(row["var_samp"]) == pytest.approx(2.0)
    assert _parse(row["var_pop"]) == pytest.approx(1.0)
    assert row["se_skew"] is None           # n<3 -> NULL, not Inf/NaN
    assert row["se_kurt"] is None


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(42)
    vals = [float(v) for v in rng.lognormal(2, 1.5, 4000)]
    base = None
    for parts in (1, 7, 64):
        df = _mk_df(spark, vals).repartition(parts)
        row = _row(profile(df), "x").asDict()
        if base is None:
            base = row
            continue
        for k, v in base.items():
            got = row[k]
            if k in ("column", "dtype"):
                assert got == v
            elif isinstance(v, str):
                # sig6 strings: allow last-digit wobble from merge order
                assert _parse(got) == pytest.approx(_parse(v), rel=2e-6), \
                    f"{k} at {parts} partitions: {got} vs {v}"
            else:
                assert got == v, f"{k} at {parts} partitions (exact)"


def test_timestamp_epoch_stats(spark):
    import datetime as dt
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i) for i in range(48)]
    schema = T.StructType([T.StructField("t", T.TimestampType(), True)])
    df = spark.createDataFrame([(t,) for t in ts], schema)
    row = _row(profile(df), "t")
    epoch0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000
    assert row["min_val"] == epoch0
    assert row["max_val"] == epoch0 + 47 * 3600 * 1000
    assert row["min_len"] is None  # dates contribute no length stats


def test_incremental_profile_state_merge(spark):
    """The explicit state API: states of N chunks merged in ANY order
    finalize to the same statistics as the one-shot state, and the
    statistics match numpy on the concatenated data."""
    import numpy as np
    from flink_descriptive_stats_spark.operators import moments as mo
    rng = np.random.RandomState(11)
    xs = np.concatenate([rng.randn(40) * 3 + 1, rng.randn(60) * 0.5 - 2,
                         rng.randn(25) + 10, rng.randn(35)])
    chunks = [xs[:40], xs[40:100], xs[100:125], xs[125:]]
    dfs = [spark.createDataFrame([(float(v),) for v in ch], "x double")
           for ch in chunks]
    states = [mo.profile_state(d, ["x"]) for d in dfs]

    def fold(order):
        acc = states[order[0]]
        for i in order[1:]:
            acc = mo.merge_profile_states(acc, states[i])
        return {r["column"]: r for r in
                mo.finalize_profile_state(acc).collect()}

    a = fold([0, 1, 2, 3])
    b = fold([3, 1, 0, 2])
    assert a["x"].asDict() == b["x"].asDict()      # order-independent

    one_shot = {r["column"]: r for r in mo.finalize_profile_state(
        mo.profile_state(spark.createDataFrame(
            [(float(v),) for v in xs], "x double"), ["x"])).collect()}
    assert a["x"].asDict() == one_shot["x"].asDict()

    def f(s):
        return float(s.replace("e", "E"))

    r = a["x"]
    assert r["n"] == len(xs)
    assert abs(f(r["mean"]) - xs.mean()) < 1e-5 * max(1, abs(xs.mean()))
    assert abs(f(r["var_pop"]) - xs.var()) < 1e-5 * xs.var()
    m2 = ((xs - xs.mean()) ** 2).sum()
    m3 = ((xs - xs.mean()) ** 3).sum()
    m4 = ((xs - xs.mean()) ** 4).sum()
    n = len(xs)
    skew = m3 * np.sqrt(n) / m2 ** 1.5
    kurt = n * m4 / m2 ** 2 - 3
    assert abs(f(r["skewness"]) - skew) < 1e-5 * max(1, abs(skew))
    assert abs(f(r["kurtosis"]) - kurt) < 1e-5 * max(1, abs(kurt))
    assert r["min_val"] == xs.min() and r["max_val"] == xs.max()


def test_incremental_profile_state_degenerate(spark):
    from flink_descriptive_stats_spark.operators import moments as mo
    empty = mo.profile_state(
        spark.createDataFrame([], "x double"), ["x"])
    one = mo.profile_state(
        spark.createDataFrame([(7.0,)], "x double"), ["x"])
    merged = {r["column"]: r for r in mo.finalize_profile_state(
        mo.merge_profile_states(empty, one)).collect()}
    r = merged["x"]
    # empty is the monoid identity; constant data -> skew/kurt 0
    assert r["n"] == 1 and r["min_val"] == r["max_val"] == 7.0
    assert float(r["skewness"].replace("e", "E")) == 0.0
