"""Reference-fixture replication (SURVEY.md §5.3): profile the exact
ProfileJob.getRowArray synthetic table and assert independently computed
expectations — exact for counts/min/max, 1e-9 relative for moments."""

import math

import pytest

from flink_descriptive_stats_spark.operators.profile import (
    complete_row_count, profile)
from flink_descriptive_stats_spark.operators.topk import topk_tokens
from flink_descriptive_stats_spark.sources.fixture import (
    reference_fixture_df, reference_fixture_rows)

N = 11_550  # lcm(3,7,11)*50: every branch exercised, fast


def _parse(s):
    return None if s is None else float(s.replace("e", "E"))


@pytest.fixture(scope="module")
def fixture(spark):
    df = reference_fixture_df(spark, N, num_partitions=8)
    rows = reference_fixture_rows(N)
    prof = {r["column"]: r for r in profile(df).collect()}
    return df, rows, prof


def test_col1_nulls(fixture):
    _, rows, prof = fixture
    expected_nulls = sum(1 for r in rows if r[0] is None)
    assert prof["col1"]["null_count"] == expected_nulls
    assert prof["col1"]["row_count"] == N
    assert prof["col1"]["numeric_count"] == 0   # booleans excluded (F1)
    # boolean lengths: all non-null are true -> length 4
    assert prof["col1"]["min_len"] == 4 and prof["col1"]["max_len"] == 4


def test_col3_moments(fixture):
    _, rows, prof = fixture
    xs = [r[2] for r in rows]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((v - mu) ** 2 for v in xs)
    row = prof["col3"]
    assert row["numeric_count"] == n
    assert row["min_val"] == min(xs) and row["max_val"] == max(xs)
    assert _parse(row["mean"]) == pytest.approx(mu, rel=1e-6)
    assert _parse(row["var_pop"]) == pytest.approx(m2 / n, rel=1e-6)
    assert _parse(row["stddev_pop"]) == pytest.approx(
        math.sqrt(m2 / n), rel=1e-6)
    # integer display length of col3
    lens = [len(str(v)) for v in xs]
    assert row["min_len"] == min(lens) and row["max_len"] == max(lens)


def test_col2_type_counters(fixture):
    _, rows, prof = fixture
    strs = [r[1] for r in rows]
    row = prof["col2"]
    n_numeric_strings = sum(1 for s in strs if s.lstrip("+-").isdigit())
    assert row["int_count"] == n_numeric_strings   # all fit in i32 at this N
    assert row["long_count"] == n_numeric_strings
    assert row["float_count"] == n_numeric_strings
    assert row["double_count"] == n_numeric_strings
    assert row["bool_count"] == 0
    assert row["date_count"] == 0
    assert row["empty_count"] == 0
    lens = [len(s) for s in strs]
    assert row["min_len"] == 1 and row["max_len"] == max(lens)


def test_topk_values_and_patterns(fixture):
    df, rows, _ = fixture
    top = topk_tokens(df, ["col2"], k=20)
    vals = {(r["token"]): r["cnt"] for r in top.collect()
            if r["kind"] == "value"}
    count_3 = sum(1 for r in rows if r[1] == "3")
    count_7 = sum(1 for r in rows if r[1] == "7")
    count_mixed = sum(1 for r in rows if r[1] == "ABCDEF00X30A333Y")
    assert vals["3"] == count_3
    assert vals["7"] == count_7
    assert vals["ABCDEF00X30A333Y"] == count_mixed
    pats = {r["token"]: r["cnt"] for r in top.collect()
            if r["kind"] == "pattern"}
    assert "AAAAAA##A##A###A" in pats
    assert pats["AAAAAA##A##A###A"] == count_mixed
    # digit-only patterns dominate: "#" bucket = count_3+count_7+1-digit ints
    n_one_digit = sum(1 for r in rows
                      if r[1].isdigit() and len(r[1]) == 1)
    assert pats["#"] == n_one_digit


def test_complete_rows(fixture):
    df, rows, _ = fixture
    got = complete_row_count(df).collect()[0]
    expected = sum(1 for r in rows
                   if r[0] is not None and r[1].strip() != "")
    assert got["complete_count"] == expected
    assert got["row_count"] == N


def test_ranks_deterministic(fixture):
    df, _, _ = fixture
    a = sorted(map(tuple, topk_tokens(df, ["col2"], k=20).collect()))
    b = sorted(map(tuple, topk_tokens(df.repartition(3), ["col2"], k=20)
                   .collect()))
    assert a == b
