"""Corpus snapshot delta — doc-level diff between two pipeline runs.

The drift family (operators/extras.py psi/js/ks_drift, the streaming
drift monitor) answers "did the DISTRIBUTION move"; this module answers
the release-engineering question underneath it: WHICH documents changed
between yesterday's corpus and today's — what was added, what was
removed, whose content was edited — the audit you run before shipping a
new training-data snapshot (and the input to "re-tokenize only what
changed" incremental pipelines). The reference has no analog (it
profiles one snapshot of one table, ProfileJob.java:78-143); extension
surface for the pipeline story.

Identity contract: a document is keyed by ``id_col``; its content
identity is ``md5(concat_ws(US, coalesce(col, NULL_SENTINEL) for col in
content_cols))`` — the same md5-identity idiom as exact_dedup, computed
identically by DuckDB so the whole family is oracle-gatable. Documents
present in both snapshots with equal hashes are ``unchanged``; unequal
hashes are ``changed``; present only in the new snapshot ``added``; only
in the old one ``removed``.

Scale design: the content hash is computed BEFORE the join, so the full
text never shuffles — each side exchanges (id, 16-byte-hash [, source])
only; the full outer join on id is the one unavoidable co-location of
the two snapshots. The summaries aggregate the delta frame to a
4-row / (sources x 4)-row table. A duplicated id within one snapshot is
a data bug this operator would silently multiply through the join, so
ids are expected unique per snapshot (exact_dedup / keep_first is the
upstream remediation; key_candidates the detector).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.functions.sig import sig6

#: field separator / NULL sentinel inside the content-identity hash —
#: unit/record separators (chr 31/30), neither plausible in text and
#: both representable in DuckDB varchars (NUL is not)
HASH_SEP = "\x1f"
NULL_SENTINEL = "\x1eNULL\x1e"

STATUSES = ("added", "removed", "changed", "unchanged")


def content_hash_expr(content_cols: tuple[str, ...]) -> Column:
    """md5 over the NULL-sentineled, US-joined content columns — the
    snapshot content identity (SQL twin: oracle_pipeline._delta_hash)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
             for c in content_cols]
    return F.md5(F.concat_ws(HASH_SEP, *parts))


def corpus_delta(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                 content_cols: tuple[str, ...] = ("text",),
                 carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-document delta: (id, status) for every id present in either
    snapshot, status in added/removed/changed/unchanged (see module
    contract). ``carry_cols`` are carried through for slicing (taken
    from the NEW snapshot, falling back to the old one for removed
    docs — e.g. ``carry_cols=("source",)`` feeds delta_by_source).

    One full outer join on id over pre-hashed narrow frames."""
    o = old.select(F.col(id_col).alias("id"),
                   content_hash_expr(content_cols).alias("__ho"),
                   *[F.col(c).alias(f"__o_{c}") for c in carry_cols])
    n = new.select(F.col(id_col).alias("id"),
                   content_hash_expr(content_cols).alias("__hn"),
                   *[F.col(c).alias(f"__n_{c}") for c in carry_cols])
    j = o.join(n, "id", "full")
    status = (F.when(F.col("__ho").isNull(), F.lit("added"))
              .when(F.col("__hn").isNull(), F.lit("removed"))
              .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    carried = [F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c)
               for c in carry_cols]
    return j.select(F.col("id"), status.alias("status"), *carried)


def delta_summary(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  content_cols: tuple[str, ...] = ("text",)) -> DataFrame:
    """The release-note numbers: one row per status with its count and
    its share of the union of both snapshots (sig6). Statuses absent
    from the delta (e.g. nothing removed) are emitted with n = 0, so
    the shape is always 4 rows — a monitorable, joinable contract.

    The total is a window sum over the 4-row joined frame (NOT a
    second aggregate over the delta), so the corpus_delta full-outer-
    join subtree appears exactly ONCE in the plan — a separate
    counts.agg() branch duplicated it and cost a second pass per
    action. The empty window is bounded by construction: the frame is
    the 4-status domain, never data-scale."""
    from pyspark.sql import Window
    d = corpus_delta(old, new, id_col=id_col, content_cols=content_cols)
    counts = d.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
    spark = old.sparkSession
    frame = spark.createDataFrame([(s,) for s in STATUSES],
                                  "status string")
    joined = (frame.join(counts, "status", "left")
              .select("status",
                      F.coalesce(F.col("n"), F.lit(0)).alias("n")))
    total = F.sum("n").over(Window.partitionBy())
    return joined.select(
        "status", "n",
        sig6(F.col("n").cast("double")
             / total.cast("double")).alias("share"))


def delta_by_source(old: DataFrame, new: DataFrame,
                    source_col: str = "source", id_col: str = "doc_id",
                    content_cols: tuple[str, ...] = ("text",)) -> DataFrame:
    """The triage cut: (source, status, n) — WHICH feed churned. Source
    is taken from the new snapshot (old for removed docs). Only observed
    (source, status) combinations are emitted; one bounded groupBy over
    the delta frame."""
    d = corpus_delta(old, new, id_col=id_col, content_cols=content_cols,
                     carry_cols=(source_col,))
    return (d.groupBy(source_col, "status")
            .agg(F.count(F.lit(1)).alias("n")))


# --------------------------------------------------------------------------
# deterministic "new snapshot" fixture (documents perturbed by doc_id)
# --------------------------------------------------------------------------
#: the test tables hold one snapshot, so the oracle-gated queries derive
#: the second deterministically: docs with id % 7 == 0 are dropped
#: (removed), id % 11 == 0 get ' rev2' appended (changed), and copies of
#: id % 13 == 0 reappear with id + ADDED_ID_OFFSET (added). SQL twin:
#: oracle_pipeline._synth_new_snapshot_sql.
REMOVED_MOD = 7
CHANGED_MOD = 11
ADDED_MOD = 13
ADDED_ID_OFFSET = 1_000_000


def synth_new_snapshot(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Perturb one snapshot into a deterministic 'next run' (see the
    constants above) — the Spark side of the shared delta fixture."""
    i = F.col(id_col)
    kept = (df.where(i % REMOVED_MOD != 0)
            .withColumn(text_col,
                        F.when(i % CHANGED_MOD == 0,
                               F.concat(F.col(text_col), F.lit(" rev2")))
                        .otherwise(F.col(text_col))))
    added = (df.where(i % ADDED_MOD == 0)
             .withColumn(id_col, i + ADDED_ID_OFFSET))
    return kept.unionByName(added)


def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Column-level snapshot diff — the schema companion of
    corpus_delta (rows) and extras.profile_compare (statistics): one
    row per column present in either snapshot with (column, status,
    old_type, new_type), status in added/removed/type_changed/
    unchanged. The pre-flight check before any cross-snapshot join or
    union: a silently re-typed column (bigint -> double is the classic
    parquet-writer drift) breaks hash identities downstream.

    Driver-side over the two schemas — no job runs; column order
    follows the NEW snapshot (removed columns trail in old order)."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for name in list(n) + [c for c in o if c not in n]:
        ot, nt = o.get(name), n.get(name)
        status = ("added" if ot is None else
                  "removed" if nt is None else
                  "unchanged" if ot == nt else "type_changed")
        rows.append((name, status, ot, nt))
    return old.sparkSession.createDataFrame(
        rows, "column string, status string, old_type string, "
              "new_type string")
