"""Count-min sketch token counting — the mergeable-sketch path for global
top-K over unbounded streams.

The exact top-K (operators/topk.py) is per-scope exact; a cross-window
global top-K over an unbounded stream cannot keep exact per-token counts.
The count-min sketch is the standard answer: a depth x width counter grid
where token t increments cell (j, h_j(t)) for each of ``depth`` hash rows,
and est(t) = min_j grid[j][h_j(t)] >= true(t) (overestimates only, never
under). The grid is a few KB, a commutative monoid (cell-wise sum), and
mergeable across partitions, windows, and days — the shape that scales to
100 TB and streams.

Hashes are md5-derived (functions/hashing.py) so the whole pipeline is
deterministic and DuckDB-verifiable. Physical shape: one groupBy((j,
bucket)) shuffle with map-side combine builds the grid (depth x width keys
max); estimation broadcasts the grid back against the distinct tokens.

No reference counterpart (the reference's top-K is an exact global sort,
ProfileJob.java:195-208); this extends the engine's streaming story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.functions import hashing as H

CM_DEPTH = 4
CM_WIDTH = 1024


def _bucket(token: F.Column, j: int, width: int) -> F.Column:
    return H.token_hash(F.concat(F.lit(f"cm{j}/"), token)) % width


def _token_occurrences(df: DataFrame, text_col: str) -> DataFrame:
    return (df.where(F.col(text_col).isNotNull())
            .select(F.explode(H.tokens_expr(F.col(text_col)))
                    .alias("token")))


def countmin_grid_from_occurrences(tok: DataFrame, depth: int = CM_DEPTH,
                                   width: int = CM_WIDTH) -> DataFrame:
    """(d, b, c) grid over an existing (token) occurrence DataFrame —
    lets callers that also need the token set tokenize once."""
    rows = [tok.select(F.lit(j).alias("d"),
                       _bucket(F.col("token"), j, width).alias("b"))
            for j in range(depth)]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionAll(r)
    return allrows.groupBy("d", "b").agg(F.count(F.lit(1)).alias("c"))


def countmin_sketch(df: DataFrame, text_col: str = "text",
                    depth: int = CM_DEPTH, width: int = CM_WIDTH
                    ) -> DataFrame:
    """(d, b, c): the counter grid over all token occurrences."""
    return countmin_grid_from_occurrences(
        _token_occurrences(df, text_col), depth, width)


def estimate_tokens(sketch: DataFrame, tokens: DataFrame,
                    depth: int = CM_DEPTH, width: int = CM_WIDTH
                    ) -> DataFrame:
    """(token, est): count-min estimate min_j grid[j][h_j(t)] for each
    candidate token against a (d, b, c) grid DataFrame."""
    probes = tokens.select(
        "token",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("d"),
                     _bucket(F.col("token"), j, width).alias("b"))
            for j in range(depth)])).alias("p")
    ).select("token", "p.d", "p.b")
    return (probes.join(F.broadcast(sketch), ["d", "b"])
            .groupBy("token").agg(F.min("c").alias("est")))


def rank_estimates(est: DataFrame, k: int) -> DataFrame:
    """(token, est, rank): deterministic ranking (est desc, token asc)."""
    w = Window.orderBy(F.col("est").desc(), F.col("token").asc())
    return (est.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def countmin_topk(df: DataFrame, text_col: str = "text", k: int = 20,
                  depth: int = CM_DEPTH, width: int = CM_WIDTH
                  ) -> DataFrame:
    """(token, est, rank): top-k tokens by count-min estimate, ties broken
    by token asc. est >= true count always (one-sided error)."""
    sketch = countmin_sketch(df, text_col, depth, width)
    dist = _token_occurrences(df, text_col).distinct()
    return rank_estimates(estimate_tokens(sketch, dist, depth, width), k)
