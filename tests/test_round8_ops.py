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
