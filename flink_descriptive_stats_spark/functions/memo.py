"""Per-process memo for collected single-row aggregates.

Several operators end in "collect ONE row of aggregates, post-process
driver-side" (profile, quantiles, outlier fences, distinct counts). When two
queries need the same aggregate bundle over the same immutable input —
jb_report after profile, outlier fences after quartiles — the second collect
is pure repeat work. The memo is keyed by (session, analyzed-plan semantic
hash, caller tag), so it hits only for semantically identical inputs within
one process, and assumes batch inputs are immutable for the session — the
standard batch-analytics contract (same assumption Spark's own cache()
makes). Bounded FIFO; falls back to plain execution when a plan hash is
unavailable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

_MEMO: dict[tuple, object] = {}
_MEMO_MAX = 128


def agg_row_memoized(df: DataFrame, agg_exprs: list[Column], tag: tuple):
    """df.agg(*agg_exprs).collect()[0], memoized per (session, plan, tag).

    ``tag`` must uniquely identify the aggregate bundle shape (caller name +
    column list + parameters) — the plan hash covers only the INPUT."""
    try:
        h = df._jdf.queryExecution().analyzed().semanticHash()
        key = (id(df.sparkSession), h, tag)
    except Exception:
        key = None
    if key is not None and key in _MEMO:
        return _MEMO[key]
    row = df.agg(*agg_exprs).collect()[0]
    if key is not None:
        if len(_MEMO) >= _MEMO_MAX:
            _MEMO.pop(next(iter(_MEMO)))
        _MEMO[key] = row
    return row
