"""Custom stateful streaming operator: per-key RUNNING profile via
``applyInPandasWithState``.

The windowed/grouped profiles (profile_stream.py) are pure built-in
aggregations — Spark manages their state. This operator is the genuinely
custom-state shape: state the engine has no aggregate for, updated with
user code per micro-batch. Here the state is the algebraic moment bundle
(n, mean, M2, min, max) — the same monoid the batch profile aggregates
(operators/moments.py; reference StatsPojo.reduce, StatsPojo.java:101-155)
— merged with each arriving Arrow batch by Chan's parallel-update formula.
Emission is one row per key per micro-batch (outputMode=update): the
profile-so-far, i.e. a continuously-updated per-key dashboard row.

Scale notes: state is O(distinct keys) x 5 doubles — the minimum possible
for exact running moments; no raw rows are retained. Arrow moves each
micro-batch's group partition into pandas in columnar batches, and the
per-batch reduction is vectorized numpy before the single state merge, so
Python-side work is O(batch) with BLAS-grade constants, not per-row
interpreter work.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("m2", T.DoubleType()),
    T.StructField("mn", T.DoubleType()),
    T.StructField("mx", T.DoubleType()),
])


def _output_schema(key_col: str) -> T.StructType:
    return T.StructType([
        T.StructField(key_col, T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("var_pop", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
    ])


def merge_moments(a: tuple, b: tuple) -> tuple:
    """Chan et al. parallel merge of two (n, mean, M2, min, max) bundles —
    the same combine the batch aggregate performs between partitions."""
    (na, ma, m2a, mna, mxa), (nb, mb, m2b, mnb, mxb) = a, b
    if na == 0:
        return b
    if nb == 0:
        return a
    n = na + nb
    d = mb - ma
    mean = ma + d * nb / n
    m2 = m2a + m2b + d * d * na * nb / n
    return (n, mean, m2, min(mna, mnb), max(mxa, mxb))


def batch_moments(x: np.ndarray) -> tuple:
    """(n, mean, M2, min, max) of one micro-batch's values (NaN dropped)."""
    x = x[~np.isnan(x)]
    n = int(x.size)
    if n == 0:
        return (0, 0.0, 0.0, math.inf, -math.inf)
    mean = float(x.mean())
    return (n, mean, float(((x - mean) ** 2).sum()),
            float(x.min()), float(x.max()))


def running_profile(stream: DataFrame, key_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Continuously-updated per-key profile of ``value_col``. Each
    micro-batch emits the updated (key, n, mean, var_pop, min, max)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        acc = state.get if state.exists else (0, 0.0, 0.0, math.inf, -math.inf)
        acc = tuple(acc)
        for pdf in pdfs:
            acc = merge_moments(
                acc, batch_moments(pdf[value_col].to_numpy(dtype=np.float64)))
        state.update(acc)
        n, mean, m2, mn, mx = acc
        if n == 0:
            return
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "mean": [mean],
                            "var_pop": [m2 / n], "min": [mn], "max": [mx]})

    return (stream.select(key_col, value_col)
            .groupBy(key_col)
            .applyInPandasWithState(update, _output_schema(key_col),
                                    STATE_SCHEMA, "update", "NoTimeout"))
