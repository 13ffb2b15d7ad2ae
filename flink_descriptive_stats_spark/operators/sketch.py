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


def _cells_of(grid_rows) -> dict[tuple[int, int], int]:
    return {(r["d"], r["b"]): int(r["c"]) for r in grid_rows}


def row_probe_expr(cells: dict[tuple[int, int], int], j: int,
                   width: int = CM_WIDTH,
                   token_col: str = "token") -> F.Column:
    """NARROW lookup of row j's cell for a token: the row is inlined as one
    literal bigint array (bounded metadata, width cells) and the probe is
    element_at at the token's bucket — zero joins, evaluable per
    occurrence row before any shuffle."""
    arr = F.expr("array(" + ",".join(
        f"{cells.get((j, b), 0)}L" for b in range(width)) + ")")
    idx = (_bucket(F.col(token_col), j, width) + 1).cast("int")
    return F.element_at(arr, idx)


def estimate_expr(grid_rows, depth: int = CM_DEPTH, width: int = CM_WIDTH,
                  token_col: str = "token") -> F.Column:
    """NARROW count-min estimate from collected (d, b, c) grid rows:
    est(t) = least over rows of the literal-array cell lookup."""
    cells = _cells_of(grid_rows)
    return F.least(*[row_probe_expr(cells, j, width, token_col)
                     for j in range(depth)])


def candidate_floor(occ: DataFrame, grid_rows, k: int,
                    depth: int = CM_DEPTH, width: int = CM_WIDTH) -> int:
    """A provably sound frequency floor for top-k candidate pruning.

    Soundness: for ANY subset S of the vocabulary, the k-th largest
    estimate within S is <= the k-th largest estimate overall (a subset's
    order statistic can only be smaller), so keeping every token with
    est >= floor keeps the entire true top-k — pruning is output-invariant
    no matter how S is chosen. For the floor to actually bite, S should be
    heavy-biased: we take the tokens living in the k heaviest row-0 CELLS
    (threshold = k-th largest row-0 cell value, read off the collected
    grid for free). Every true top-k token's row-0 cell is >= its est >=
    E_k, and heavy cells hold few tokens (~vocab/width each), so S both
    contains the real heavy hitters and stays small (~k x vocab/width rows
    shuffled for its distinct). Returns 0 (prune nothing) when fewer than
    k nonzero cells or sample tokens exist (tiny vocabularies)."""
    cells = _cells_of(grid_rows)
    row0 = sorted((c for (j, _), c in cells.items() if j == 0),
                  reverse=True)
    # a small vocabulary can't be pruned meaningfully (everything is near
    # the top-k anyway) and the floor would cost two extra jobs; nonzero
    # row-0 cells lower-bound the vocabulary, so skip until it clears 8k.
    # At real vocabularies row 0 saturates toward `width` cells >> 8k.
    if len(row0) < 8 * k:
        return 0
    thresh = row0[k - 1]
    est_c = estimate_expr(grid_rows, depth, width)
    s = (occ.where(row_probe_expr(cells, 0, width) >= F.lit(thresh))
         .distinct().select(est_c.alias("est")))
    top = s.orderBy(F.col("est").desc()).limit(k).collect()
    return int(top[-1]["est"]) if len(top) == k else 0


def countmin_topk(df: DataFrame, text_col: str = "text", k: int = 20,
                  depth: int = CM_DEPTH, width: int = CM_WIDTH,
                  prune: bool = True) -> DataFrame:
    """(token, est, rank): top-k tokens by count-min estimate, ties broken
    by token asc. est >= true count always (one-sided error).

    Scale shape (VERDICT r4 item #6): the final global ranking used to be
    fed by a distinct() over EVERY token — a full-vocabulary shuffle. Now
    the collected grid is inlined as literal arrays (estimate_expr), a
    sound frequency floor is derived from the tokens of the k heaviest
    row-0 cells (candidate_floor), and occurrences are filtered by
    est >= floor BEFORE the candidate distinct — only near-heavy tokens
    reach the shuffle and the ranking window. The estimate itself is now
    a narrow expression (no grid broadcast join). Output is identical to
    the unpruned ranking for any data (floor soundness); on sub-k
    vocabularies floor = 0 and the filter passes everything.
    ``prune=False`` keeps the full-vocabulary path (test oracle)."""
    grid_rows = countmin_sketch(df, text_col, depth, width).collect()
    occ = _token_occurrences(df, text_col)
    est_c = estimate_expr(grid_rows, depth, width)
    floor = candidate_floor(occ, grid_rows, k, depth, width) if prune else 0
    cand = occ.where(est_c >= F.lit(floor)).distinct()
    return rank_estimates(cand.select("token", est_c.alias("est")), k)
