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
