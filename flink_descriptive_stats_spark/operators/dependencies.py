"""Cross-table dependency discovery — inclusion dependencies / foreign
keys.

`key_candidates` and `fd_candidates` (operators/extras.py) answer the
WITHIN-table schema questions (what is unique, what determines what);
this module answers the BETWEEN-table one: which columns reference
which — the inclusion-dependency view a profiler needs before it can
trust a join, and the first genuinely multi-table surface in the
engine. The reference profiles one table per job and has no analog
(reference: src/main/java/org/apache/flink/stats/ProfileJob.java:78-143);
the algorithmic shape follows the published SPIDER/Metanome line of
work (distinct-value containment with cheap-statistics pruning), not
any implementation.

Three tiers (complementing `extras.referential_integrity`, which
scores ROW-level orphan mass for one declared fact->dim pair; this
module works at the schema level — distinct-KEY containment — and in
both declared-graph and undeclared-discovery forms):

- `inclusion_dependencies`: the DECLARED graph — every (child_col ->
  parent_col) edge of the schema's FK diagram audited into one result
  table with exact orphan-key counts. The audit you run on tables that
  are SUPPOSED to be referentially intact.
- `fk_orphan_rows`: the triage ACTION — the child ROWS whose key has
  no parent (the rows an intact inner join would silently drop;
  referential_integrity counts them, this returns them).
- `fk_discover`: UNDECLARED discovery over a dict of tables — exact
  single-column-key detection, then type/range/cardinality pruning,
  then exact containment for the survivors. Emits every inclusion that
  holds, with a `name_affinity` flag (column-name suffix match) as the
  ranking signal; range-contained coincidences (a 0-4 key inside a
  0-24 key) are inherent to data-driven discovery and are reported
  honestly rather than hidden.

Scale design (the 100 TB story):

- containment never shuffles full rows: both sides are projected to
  the single key column and DISTINCT'd FIRST, so the join exchanges
  key-cardinality rows only; the parent side of a real FK is
  dim-table-scale and AQE broadcasts it.
- orphan counting rides the SAME left join that proves containment
  (one pass, no second anti-join).
- `fk_discover`'s pruning stats are ONE aggregate per table (count /
  count_distinct / min / max per eligible column — the key_candidates
  Expand shape), collected as a handful of driver rows; only pairs the
  bounded stats cannot rule out pay a distinct-join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.functions.sig import sig6

#: Spark simpleString dtypes eligible for fk_discover (FK keys are
#: integral in practice; bounding the type family keeps the per-table
#: stats pass narrow and the oracle mirror literal).
DISCOVER_DTYPES: tuple[str, ...] = ("tinyint", "smallint", "int", "bigint")


def _containment_row(child: DataFrame, child_col: str,
                     parent: DataFrame, parent_col: str) -> DataFrame:
    """One-row frame (n_child_distinct, n_orphans) for a single pair:
    distinct child keys LEFT-joined to distinct parent keys, orphans
    counted on the join miss — containment proved and quantified in the
    same pass. NULL keys are out of scope on both sides (a NULL FK is
    'no reference', not a dangling one)."""
    ck = (child.select(F.col(child_col).alias("__k"))
          .where(F.col("__k").isNotNull()).distinct())
    pk = (parent.select(F.col(parent_col).alias("__k"))
          .where(F.col("__k").isNotNull()).distinct()
          .withColumn("__hit", F.lit(1)))
    return (ck.join(pk, "__k", "left")
            .agg(F.count(F.lit(1)).alias("n_child_distinct"),
                 F.count(F.when(F.col("__hit").isNull(), 1))
                 .alias("n_orphans")))


def _labelled_pair(child: DataFrame, child_col: str,
                   parent: DataFrame, parent_col: str,
                   child_name: str, parent_name: str) -> DataFrame:
    """The one-row audit frame for a pair, with the pair identity as
    literal columns and the derived stats computed lazily — union-able
    across pairs into ONE job (independent subtrees schedule
    concurrently instead of one collect per pair)."""
    nd, orph = F.col("n_child_distinct"), F.col("n_orphans")
    # empty child: contained vacuously (the NOT EXISTS convention)
    cont = F.when(nd == 0, F.lit(1.0)).otherwise(
        (nd - orph).cast("double") / nd.cast("double"))
    return _containment_row(child, child_col, parent, parent_col).select(
        F.lit(child_name).alias("child_table"),
        F.lit(child_col).alias("child_col"),
        F.lit(parent_name).alias("parent_table"),
        F.lit(parent_col).alias("parent_col"),
        nd, orph,
        sig6(cont).alias("containment"),
        (orph == 0).alias("ind_holds"))


def inclusion_dependencies(
        specs: list[tuple[str, DataFrame, str, str, DataFrame, str]]
) -> DataFrame:
    """Exact inclusion-dependency audit of a declared FK graph: each
    spec is (child_name, child_df, child_col, parent_name, parent_df,
    parent_col); one output row per spec with the distinct child-key
    count, the orphan-key count (child keys absent from the parent),
    containment = contained/distinct (sig6-rendered; empty child = 1.0,
    the NOT EXISTS convention), and ind_holds (zero orphans). A violated
    edge means an inner join on it silently drops child rows —
    `fk_orphan_rows` returns them, `extras.referential_integrity` scores
    their row mass.

    Each spec costs one distinct-distinct left join over key columns
    only; the per-edge one-row audits are UNIONed into a single lazy
    plan, so the whole graph is one job whose independent edge subtrees
    run concurrently."""
    if not specs:
        raise ValueError(
            "inclusion_dependencies needs at least one spec")
    return reduce(DataFrame.unionByName,
                  (_labelled_pair(cdf, cc, pdf, pc, cn, pn)
                   for cn, cdf, cc, pn, pdf, pc in specs))


def fk_orphan_rows(child: DataFrame, parent: DataFrame,
                   child_col: str, parent_col: str) -> DataFrame:
    """The rows behind a violated inclusion dependency: every child row
    (full width) whose non-NULL key has no match in the parent — the
    triage view `inclusion_dependencies` plans for. NULL-keyed rows are
    excluded (no reference to dangle).

    Scale: the parent is projected to its distinct key before the
    anti-join, so the build side is key-cardinality; the child rides
    the join once, full rows, no pre-shuffle."""
    pk = (parent.select(F.col(parent_col).alias("__pk"))
          .where(F.col("__pk").isNotNull()).distinct())
    return (child.where(F.col(child_col).isNotNull())
            .join(pk, on=F.col(child_col) == F.col("__pk"), how="anti"))


def _suffix(name: str) -> str:
    """Column-name affinity key: everything after the first underscore
    (TPC-H style c_nationkey/n_nationkey -> 'nationkey'); a name with
    no underscore keys on itself. Mirrored in SQL as
    regexp_replace(name, '^[^_]*_', '')."""
    return name.split("_", 1)[-1]


def fk_discover(tables: dict[str, DataFrame],
                min_containment: float = 1.0,
                approx: bool = False) -> DataFrame:
    """Undeclared foreign-key discovery over a dict of named tables:
    (child_table, child_col, parent_table, parent_col,
    n_child_distinct, n_orphans, containment, name_affinity) for every
    directed column pair that survives pruning and reaches
    ``min_containment`` (default 1.0 — strict inclusion).

    Contract (declarative — the pruning predicates are necessary
    conditions on exact statistics, so the output is exactly "all pairs
    satisfying these predicates", independent of evaluation order):

    - eligible columns: integral dtypes (`DISCOVER_DTYPES`).
    - parent column: an exact single-column key — distinct == non-null
      == row count, over a non-empty table.
    - child column: >= 1 non-null value; not the same (table, column)
      as the parent; distinct <= parent distinct; [min, max] within the
      parent's [min, max].
    - emitted when exact containment >= min_containment; name_affinity
      = suffix-after-first-underscore equality, the ranking signal
      (range-contained coincidences are reported, not hidden).

    Cost: ONE stats aggregate per table (bounded driver rows), then one
    key-distinct left join per surviving pair, all UNIONed into a
    single lazy result plan (the survivor joins run concurrently in one
    job).

    ``approx`` (the 100 TB stats pass): count_distinct inside the
    per-table stats aggregate is exact but shuffles per column;
    approx=True swaps it for approx_count_distinct (HLL++, mergeable
    fixed-size state, map-side combined). The HEURISTIC changes: a
    sketch estimate can mis-rank key-ness or child-vs-parent
    cardinality near the boundary, so pruning — and therefore the pair
    set TESTED — is approximate (the declarative contract above holds
    exactly only for approx=False; the containment numbers of every
    emitted pair remain exact either way). Use it to scope candidates
    on a corpus where exact per-column distincts are a real cost, then
    confirm with the default mode on the survivors."""
    if not tables:
        raise ValueError("fk_discover needs at least one table")
    stats: dict[tuple[str, str], dict] = {}
    distinct_of = (F.approx_count_distinct if approx
                   else F.count_distinct)
    for tname, df in tables.items():
        cols = [f.name for f in df.schema.fields
                if f.dataType.simpleString() in DISCOVER_DTYPES]
        if not cols:
            continue
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs += [F.count(F.col(c)).alias(f"{c}__nn"),
                     distinct_of(F.col(c)).alias(f"{c}__d"),
                     F.min(F.col(c)).cast("bigint").alias(f"{c}__mn"),
                     F.max(F.col(c)).cast("bigint").alias(f"{c}__mx")]
        row = df.agg(*aggs).collect()[0]
        for c in cols:
            stats[(tname, c)] = {
                "n": int(row["__n"]), "nn": int(row[f"{c}__nn"]),
                "d": int(row[f"{c}__d"]), "mn": row[f"{c}__mn"],
                "mx": row[f"{c}__mx"],
            }
    # approx mode: HLL++ default relative error is ~5%, so the two
    # cardinality predicates get matching slack (the min/max and
    # non-null predicates stay exact counts in both modes)
    eps = 0.05 if approx else 0.0

    def _is_key(s: dict) -> bool:
        if s["n"] == 0 or s["nn"] != s["n"]:
            return False
        return abs(s["d"] - s["nn"]) <= eps * s["nn"]

    parents = [(t, c) for (t, c), s in stats.items() if _is_key(s)]
    spark = next(iter(tables.values())).sparkSession
    frames = []
    for (pt, pc) in parents:
        ps = stats[(pt, pc)]
        for (ct, cc), cs in stats.items():
            if (ct, cc) == (pt, pc) or cs["nn"] == 0:
                continue
            if (cs["d"] > ps["d"] * (1.0 + eps) or cs["mn"] < ps["mn"]
                    or cs["mx"] > ps["mx"]):
                continue
            nd, orph = F.col("n_child_distinct"), F.col("n_orphans")
            cont = (nd - orph).cast("double") / nd.cast("double")
            frames.append(
                _containment_row(tables[ct], cc, tables[pt], pc)
                .where(cont >= F.lit(float(min_containment)))
                .select(F.lit(ct).alias("child_table"),
                        F.lit(cc).alias("child_col"),
                        F.lit(pt).alias("parent_table"),
                        F.lit(pc).alias("parent_col"),
                        nd, orph,
                        sig6(cont).alias("containment"),
                        F.lit(_suffix(cc) == _suffix(pc))
                        .alias("name_affinity")))
    schema = ("child_table string, child_col string, parent_table string, "
              "parent_col string, n_child_distinct bigint, "
              "n_orphans bigint, containment string, name_affinity boolean")
    if not frames:
        return spark.createDataFrame([], schema)
    return reduce(DataFrame.unionByName, frames)


def fk_repair(child: DataFrame, parent: DataFrame,
              child_col: str, parent_col: str,
              action: str = "drop") -> DataFrame:
    """The remediation behind a violated inclusion dependency —
    `inclusion_dependencies` detects, `fk_orphan_rows` shows,
    this FIXES, restoring the invariant an inner join needs:

    - action='drop'     remove orphan rows (semi-join on the distinct
                        parent key; NULL-keyed rows KEPT — a NULL FK is
                        'no reference', already join-safe).
    - action='nullify'  keep every row but set dangling keys to NULL
                        (left join + conditional overwrite) — the
                        choice when the child's other columns must
                        survive.

    Scale: parent collapses to its distinct key either way; 'drop' is
    the same build-side shape as fk_orphan_rows with the join flipped
    to semi; 'nullify' carries full child rows through one left join."""
    if action not in ("drop", "nullify"):
        raise ValueError(
            f"action must be 'drop' or 'nullify', got {action!r}")
    pk = (parent.select(F.col(parent_col).alias("__pk"))
          .where(F.col("__pk").isNotNull()).distinct())
    if action == "drop":
        keyed = child.where(F.col(child_col).isNotNull()).join(
            pk, on=F.col(child_col) == F.col("__pk"), how="semi")
        return keyed.unionByName(
            child.where(F.col(child_col).isNull()))
    j = child.join(pk.withColumn("__hit", F.lit(1)),
                   on=F.col(child_col) == F.col("__pk"), how="left")
    nullified = F.when(F.col("__hit").isNotNull()
                       | F.col(child_col).isNull(),
                       F.col(child_col)).otherwise(F.lit(None))
    return (j.withColumn(child_col, nullified)
            .drop("__pk", "__hit"))
