"""DuckDB oracle-SQL generators.

The driver's correctness gate runs each ``queries()`` entry on Spark and the
matching ``oracle_sql()`` string on DuckDB over the same parquet tables, then
compares row-count + schema + order-insensitive value hash. The SQL emitted
here mirrors the engine's semantics exactly:

- moments via TWO-PASS centered sums (exact mean, then sum((x-mu)^k)) — a
  numerically stronger computation than any single-pass stream, so oracle
  agreement to 7 significant digits validates the Spark pairwise-merge path;
- identical zero-guards / NULL policy as operators/moments.py;
- identical regexes / pattern steps imported from functions/scalar.py, so the
  two sides cannot drift;
- all FP outputs rendered via the shared '%.6e' convention (functions/sig.py).

The generators take the STATIC schema map below (verified against
FIXTURES.md / the parquet files) because oracle_sql() must produce strings
without a live SparkSession.
"""

from __future__ import annotations

from pyspark.sql import types as T

from flink_descriptive_stats_spark.functions import scalar
from flink_descriptive_stats_spark.functions.sig import duck_sig6
from flink_descriptive_stats_spark.operators import moments

_TYPES = {
    "int": T.IntegerType(), "bigint": T.LongType(), "double": T.DoubleType(),
    "string": T.StringType(), "timestamp": T.TimestampType(),
}

# table -> [(column, spark simple type)] — mirrors /root/testdata parquet.
TABLE_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "lineitem": [
        ("l_orderkey", "bigint"), ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"), ("l_linenumber", "int"),
        ("l_quantity", "double"), ("l_extendedprice", "double"),
        ("l_discount", "double"), ("l_tax", "double"),
        ("l_returnflag", "string"), ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
    "orders": [
        ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"), ("o_orderpriority", "string"),
    ],
    "customer": [
        ("c_custkey", "bigint"), ("c_name", "string"),
        ("c_nationkey", "int"), ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "part": [
        ("p_partkey", "bigint"), ("p_name", "string"), ("p_brand", "string"),
        ("p_type", "string"), ("p_size", "int"), ("p_retailprice", "double"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"), ("s_name", "string"),
        ("s_nationkey", "int"), ("s_acctbal", "double"),
    ],
    "nation": [("n_nationkey", "int"), ("n_name", "string"),
               ("n_regionkey", "int")],
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "events": [
        ("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"),
        ("event_type", "string"), ("value", "double"), ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"),
    ],
    "embeddings": [("vec_id", "bigint"), ("embedding", "array<float>"),
                   ("label", "int")],
}


def spark_type(type_str: str) -> T.DataType:
    return _TYPES[type_str]


def _derived_exprs() -> dict[str, str]:
    """Derived-stat SQL (names = moments.DERIVED_STATS), assuming an
    enclosing relation with columns n, row_count, mean, mn, mx, m2, m3, m4
    plus pre-derived var_pop_r, var_samp_r, sd_pop_r, sd_samp_r, skew_pop_r,
    kurt_pop_r, skew_samp_r, kurt_samp_r (see _pre_derived_cases)."""
    nd = "CAST(n AS DOUBLE)"
    exprs = {
        "mean": "CASE WHEN n = 0 THEN NULL ELSE mean END",
        "var_pop": "CASE WHEN n = 0 THEN NULL ELSE var_pop_r END",
        "var_samp": "CASE WHEN n >= 2 THEN var_samp_r ELSE NULL END",
        "stddev_pop": "CASE WHEN n = 0 THEN NULL ELSE sd_pop_r END",
        "stddev_samp": "CASE WHEN n >= 2 THEN sd_samp_r ELSE NULL END",
        "skew_pop": "skew_pop_r",
        "skew_samp": "skew_samp_r",
        "kurt_pop": "kurt_pop_r",
        "kurt_samp": "kurt_samp_r",
        "kurt_excess_pop": "CASE WHEN n = 0 THEN NULL ELSE kurt_pop_r - 3.0 END",
        "kurt_excess_samp": "CASE WHEN n = 0 THEN NULL ELSE kurt_samp_r - 3.0 END",
        "se_mean": f"CASE WHEN n >= 2 THEN sd_samp_r / sqrt({nd}) ELSE NULL END",
        "se_var": f"CASE WHEN n >= 2 THEN var_samp_r * sqrt(2.0 / ({nd} - 1)) ELSE NULL END",
        "se_stddev": f"CASE WHEN n >= 2 THEN sd_samp_r / sqrt(2 * ({nd} - 1)) ELSE NULL END",
        "se_skew": (f"CASE WHEN n >= 3 THEN sqrt((6 * {nd} * ({nd} - 1)) / "
                    f"(({nd} - 2) * ({nd} + 1) * ({nd} + 3))) ELSE NULL END"),
        "se_kurt": (f"CASE WHEN n >= 4 THEN 2 * sqrt((6 * {nd} * ({nd} - 1)) / "
                    f"(({nd} - 2) * ({nd} + 1) * ({nd} + 3))) * "
                    f"sqrt(({nd} * {nd} - 1) / (({nd} - 3) * ({nd} + 5))) "
                    f"ELSE NULL END"),
        "jb_score": (f"CASE WHEN n = 0 THEN NULL ELSE ({nd} / 6.0) * "
                     f"(skew_samp_r * skew_samp_r + 0.25 * "
                     f"(kurt_samp_r - 3.0) * (kurt_samp_r - 3.0)) END"),
        "scott_bin_width": (
            "CASE WHEN n = 0 THEN NULL ELSE "
            "(CASE ceil(skew_pop_r) WHEN 1 THEN 0.4 WHEN 2 THEN 0.6 "
            "WHEN 3 THEN 0.7 ELSE 1.0 END) * "
            "floor(3.49 * sd_pop_r * pow(CAST(row_count AS DOUBLE), -1.0/3.0)) END"),
    }
    assert set(exprs) == set(moments.DERIVED_STATS)
    return exprs


def _derived_sql(stats: tuple[str, ...] | None = None) -> list[str]:
    exprs = _derived_exprs()
    names = stats or moments.DERIVED_STATS
    return [f"{duck_sig6(exprs[s])} AS {s}" for s in names]


_PRE_DERIVED_CASES = """
        CASE WHEN n > 0 THEN m2 / n END AS var_pop_r,
        CASE WHEN n > 1 THEN m2 / (n - 1) END AS var_samp_r,
        CASE WHEN n > 0 THEN sqrt(m2 / n) END AS sd_pop_r,
        CASE WHEN n > 1 THEN sqrt(m2 / (n - 1)) END AS sd_samp_r,
        CASE WHEN n = 0 THEN NULL WHEN m2 = 0 THEN 0.0
             WHEN abs((m3 / n) / pow(m2 / n, 1.5)) < 1e-9 THEN 0.0
             ELSE (m3 / n) / pow(m2 / n, 1.5) END AS skew_pop_r,
        CASE WHEN n = 0 THEN NULL WHEN m2 = 0 THEN 0.0
             ELSE (m4 / n) / pow(m2 / n, 2.0) END AS kurt_pop_r,
        CASE WHEN n = 0 THEN NULL WHEN n = 1 THEN 0.0
             ELSE skew_pop_r * n / (n - 1.0) END AS skew_samp_r,
        CASE WHEN n = 0 THEN NULL WHEN n = 1 THEN 0.0
             ELSE kurt_pop_r * n / (n - 1.0) END AS kurt_samp_r
"""


def _moment_core_sql(table: str, x: str) -> str:
    """Relation with two-pass moment slots + pre-derived stats for numeric
    expression ``x`` over ``table`` (one output row)."""
    return f"""
      SELECT *, {_PRE_DERIVED_CASES}
      FROM (
        SELECT count(*) AS row_count, count(x) AS n,
               count(*) - count(x) AS nulls,
               min(x) AS mn, max(x) AS mx, avg(x) AS mean,
               sum(pow(x - mu, 2)) AS m2, sum(pow(x - mu, 3)) AS m3,
               sum(pow(x - mu, 4)) AS m4
        FROM (SELECT {x} AS x FROM {table})
        CROSS JOIN (SELECT avg({x}) AS mu FROM {table})
      )
    """


def _null_derived() -> list[str]:
    return [f"CAST(NULL AS VARCHAR) AS {s}" for s in moments.DERIVED_STATS]


_COUNTERS = [("bool_count", scalar.duck_parses_bool),
             ("int_count", scalar.duck_parses_int),
             ("long_count", scalar.duck_parses_long),
             ("float_count", scalar.duck_parses_float),
             ("double_count", scalar.duck_parses_float),
             ("date_count", scalar.duck_parses_date)]


def profile_column_sql(table: str, col: str, type_str: str) -> str:
    """One UNION ALL branch of the profile oracle: the full profile row for
    one column, mirroring operators/profile.py output exactly."""
    dt = spark_type(type_str)
    x = scalar.duck_numeric_expr(col, dt)
    ln = scalar.duck_length_expr(col, dt)
    is_str = isinstance(dt, T.StringType)

    sel = [f"'{col}' AS \"column\"", f"'{dt.simpleString()}' AS dtype",
           "CAST(row_count AS BIGINT) AS row_count",
           "CAST(nulls AS BIGINT) AS null_count"]
    if x is not None:
        sel += ["CAST(n AS BIGINT) AS numeric_count"]
    else:
        sel += ["CAST(0 AS BIGINT) AS numeric_count"]
    if is_str:
        sel += ["CAST(empty_c AS BIGINT) AS empty_count"]
    else:
        sel += ["CAST(NULL AS BIGINT) AS empty_count"]
    if x is not None:
        sel += ["mn AS min_val", "mx AS max_val"]
        sel += _derived_sql()
    else:
        sel += ["CAST(NULL AS DOUBLE) AS min_val",
                "CAST(NULL AS DOUBLE) AS max_val"]
        sel += _null_derived()
    if ln is not None:
        sel += ["CAST(min_len_c AS BIGINT) AS min_len",
                "CAST(max_len_c AS BIGINT) AS max_len",
                duck_sig6("avg_len_c") + " AS avg_len"]
    else:
        sel += ["CAST(NULL AS BIGINT) AS min_len",
                "CAST(NULL AS BIGINT) AS max_len",
                "CAST(NULL AS VARCHAR) AS avg_len"]
    for cname, _fn in _COUNTERS:
        if is_str:
            sel += [f"CAST({cname}_c AS BIGINT) AS {cname}"]
        else:
            sel += [f"CAST(NULL AS BIGINT) AS {cname}"]

    # side slots computed directly over the table (lengths, string counters)
    side = []
    if ln is not None:
        side += [f"min({ln}) AS min_len_c", f"max({ln}) AS max_len_c",
                 f"avg({ln}) AS avg_len_c"]
    if is_str:
        side += [f"count(*) FILTER (WHERE {scalar.duck_is_blank(col)}) AS empty_c"]
        for cname, fn in _COUNTERS:
            side += [f"count(*) FILTER (WHERE {fn(col)}) AS {cname}_c"]

    if x is not None:
        core = _moment_core_sql(table, x)
    else:
        core = (f"SELECT count(*) AS row_count, "
                f"count(*) FILTER (WHERE {col} IS NULL) AS nulls "
                f"FROM {table}")

    if side:
        side_sql = f"SELECT {', '.join(side)} FROM {table}"
        frm = f"({core}) CROSS JOIN ({side_sql})"
    else:
        frm = f"({core})"
    return f"SELECT {', '.join(sel)} FROM {frm}"


def profile_table_sql(table: str) -> str:
    """Full profile oracle for ``table`` — one row per column."""
    branches = [profile_column_sql(table, col, ts)
                for col, ts in TABLE_SCHEMAS[table]]
    return "\nUNION ALL\n".join(branches)


def topk_sql(table: str, k: int = 20) -> str:
    """Oracle for operators/topk.py: top-K values + patterns per string
    column, deterministic tie-break (cnt desc, token asc)."""
    cols = [c for c, ts in TABLE_SCHEMAS[table] if ts == "string"]
    stacked = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col, {c} AS token FROM {table} "
        f"WHERE {c} IS NOT NULL" for c in cols)
    pattern = scalar.duck_pattern_expr("token")
    return f"""
WITH stacked AS ({stacked}),
melted AS (
  SELECT 'value' AS kind, col, token FROM stacked
  UNION ALL
  SELECT 'pattern' AS kind, col, {pattern} AS token FROM stacked
),
counts AS (
  SELECT kind, col, token, CAST(count(*) AS BIGINT) AS cnt
  FROM melted GROUP BY kind, col, token
)
SELECT kind, col AS "column", token, cnt,
       CAST(row_number() OVER (PARTITION BY kind, col
            ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank
FROM counts
QUALIFY rank <= {k}
"""


def _numeric_cols(table: str) -> list[str]:
    return [c for c, ts in TABLE_SCHEMAS[table]
            if ts in ("int", "bigint", "double")]


def distinct_sql(table: str) -> str:
    branches = [
        f"SELECT '{c}' AS \"column\", "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS distinct_count FROM {table}"
        for c, _ in TABLE_SCHEMAS[table]]
    return "\nUNION ALL\n".join(branches)


def quantiles_sql(table: str, probs=(0.25, 0.5, 0.75)) -> str:
    branches = []
    for c in _numeric_cols(table):
        qs = ", ".join(
            f"{duck_sig6(f'quantile_cont(CAST({c} AS DOUBLE), {p})')} "
            f"AS q_{int(p * 100)}" for p in probs)
        branches.append(f"SELECT '{c}' AS \"column\", {qs} FROM {table}")
    return "\nUNION ALL\n".join(branches)


def histogram_sql(table: str, column: str, bins: int = 20) -> str:
    lo = f"mn + bucket * ((mx - mn) / {float(bins)})"
    hi = f"mn + (bucket + 1) * ((mx - mn) / {float(bins)})"
    return f"""
WITH mm AS (SELECT min({column}) AS mn, max({column}) AS mx FROM {table}),
pts AS (SELECT x, mn, mx
        FROM (SELECT {column} AS x FROM {table}) CROSS JOIN mm
        WHERE x IS NOT NULL),
b AS (SELECT CASE WHEN mx = mn THEN 0
             ELSE least(CAST(floor((x - mn) / ((mx - mn) / {float(bins)}))
                        AS INTEGER), {bins - 1}) END AS bucket, mn, mx
      FROM pts)
SELECT bucket, {duck_sig6(lo)} AS lo, {duck_sig6(hi)} AS hi,
       CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY bucket, mn, mx
"""


def outliers_sql(table: str) -> str:
    # Fence inputs are sig6-round-tripped (render to 7 sig digits, cast
    # back to DOUBLE) exactly like extras.outlier_counts, so both engines
    # derive fences from bit-identical values. NULL fences (all-NULL
    # column) make the FILTER predicates NULL -> counts 0, matching the
    # Spark side's explicit zeros.
    branches = []
    for c in _numeric_cols(table):
        x = f"CAST({c} AS DOUBLE)"
        branches.append(f"""
SELECT '{c}' AS "column",
  CAST(count(*) FILTER (WHERE x < q1 - 1.5 * (q3 - q1)
                           OR x > q3 + 1.5 * (q3 - q1)) AS BIGINT)
    AS iqr_outliers,
  CAST(count(*) FILTER (WHERE x < mu - 3.0 * sd
                           OR x > mu + 3.0 * sd) AS BIGINT)
    AS sigma3_outliers
FROM (SELECT {x} AS x FROM {table})
CROSS JOIN (SELECT
    CAST({duck_sig6(f'quantile_cont({x}, 0.25)')} AS DOUBLE) AS q1,
    CAST({duck_sig6(f'quantile_cont({x}, 0.75)')} AS DOUBLE) AS q3,
    CAST({duck_sig6(f'avg({x})')} AS DOUBLE) AS mu,
    CAST({duck_sig6(f'stddev_pop({x})')} AS DOUBLE) AS sd FROM {table})
GROUP BY q1, q3, mu, sd""")
    return "\nUNION ALL\n".join(branches)


def correlation_sql(table: str) -> str:
    cols = _numeric_cols(table)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    branches = []
    for a, b in pairs:
        raw = f"corr(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE))"
        snapped = (f"CASE WHEN {raw} IS NOT NULL AND NOT isnan({raw}) "
                   f"AND abs({raw}) < 1e-9 THEN 0.0 ELSE {raw} END")
        branches.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"{duck_sig6(snapped)} AS corr FROM {table}")
    return "\nUNION ALL\n".join(branches)


def grouped_correlation_sql(table: str, group_col: str) -> str:
    """Oracle for extras.grouped_correlation: per-group corr over the
    same double-cast pairs (DuckDB corr returns NULL on zero variance,
    matching the Spark side's try_divide), group rendered as VARCHAR,
    the same <1e-9 zero snap as correlation_sql."""
    cols = [c for c in _numeric_cols(table) if c != group_col]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    branches = []
    for a, b in pairs:
        raw = f"corr(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE))"
        snapped = (f"CASE WHEN {raw} IS NOT NULL AND NOT isnan({raw}) "
                   f"AND abs({raw}) < 1e-9 THEN 0.0 ELSE {raw} END")
        branches.append(
            f"SELECT CAST({group_col} AS VARCHAR) AS \"group\", "
            f"'{a}' AS col_a, '{b}' AS col_b, "
            f"{duck_sig6(snapped)} AS corr FROM {table} "
            f"GROUP BY {group_col}")
    return "\nUNION ALL\n".join(branches)


def covariance_sql(table: str) -> str:
    """Oracle for extras.covariance_matrix (the agg path): DuckDB's
    covar_samp over the same double-cast pairs; NaN (degenerate n<=1)
    maps to NULL like the Spark side."""
    cols = _numeric_cols(table)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    branches = []
    for a, b in pairs:
        raw = f"covar_samp(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE))"
        safe = f"CASE WHEN isnan({raw}) THEN NULL ELSE {raw} END"
        branches.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"{duck_sig6(safe)} AS cov FROM {table}")
    return "\nUNION ALL\n".join(branches)


def grouped_covariance_sql(table: str, group_col: str) -> str:
    """Oracle for extras.grouped_covariance (the agg path): DuckDB's
    grouped covar_samp over the same double-cast pairs, group rendered
    as VARCHAR, NaN (single-row group) mapped to NULL like the Spark
    side."""
    cols = [c for c in _numeric_cols(table) if c != group_col]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    branches = []
    for a, b in pairs:
        raw = f"covar_samp(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE))"
        safe = f"CASE WHEN isnan({raw}) THEN NULL ELSE {raw} END"
        branches.append(
            f"SELECT CAST({group_col} AS VARCHAR) AS \"group\", "
            f"'{a}' AS col_a, '{b}' AS col_b, "
            f"{duck_sig6(safe)} AS cov FROM {table} "
            f"GROUP BY {group_col}")
    return "\nUNION ALL\n".join(branches)


def windowed_profile_sql(table: str = "events", ts_col: str = "ts",
                         value_col: str = "value",
                         window_hours: int = 6,
                         slide_hours: int | None = None) -> str:
    """Oracle for streaming/profile_stream.windowed_profile run in batch
    mode: Spark's window() and DuckDB's time_bucket both align to the epoch
    for whole-hour durations. With ``slide_hours`` (must divide
    window_hours) each event expands to the window/slide overlapping
    windows that contain it — exactly Spark's sliding-window membership."""
    from flink_descriptive_stats_spark.streaming.profile_stream import (
        WINDOW_STATS)
    derived = ",\n       ".join(_derived_sql(WINDOW_STATS))
    if slide_hours:
        nk = window_hours // slide_hours
        b_cte = f"""b AS (
  SELECT time_bucket(INTERVAL '{slide_hours} hours',
                     CAST({ts_col} AS TIMESTAMP))
         - k.k * INTERVAL '{slide_hours} hours' AS ws,
         CAST({value_col} AS DOUBLE) AS x
  FROM {table}
  CROSS JOIN (SELECT unnest(generate_series(0, {nk - 1})) AS k) k
)"""
    else:
        b_cte = f"""b AS (
  SELECT time_bucket(INTERVAL '{window_hours} hours',
                     CAST({ts_col} AS TIMESTAMP)) AS ws,
         CAST({value_col} AS DOUBLE) AS x
  FROM {table}
)"""
    return f"""
WITH {b_cte},
m AS (SELECT ws, avg(x) AS mu FROM b GROUP BY ws),
a AS (
  SELECT b.ws, count(*) AS row_count, count(x) AS n,
         count(*) FILTER (WHERE x IS NULL) AS null_count,
         min(x) AS mn, max(x) AS mx, avg(x) AS mean,
         sum(pow(x - mu, 2)) AS m2, sum(pow(x - mu, 3)) AS m3,
         sum(pow(x - mu, 4)) AS m4
  FROM b JOIN m ON b.ws = m.ws GROUP BY b.ws
),
p AS (SELECT *, {_PRE_DERIVED_CASES} FROM a)
SELECT ws AS window_start,
       ws + INTERVAL '{window_hours} hours' AS window_end,
       CAST(row_count AS BIGINT) AS row_count,
       CAST(null_count AS BIGINT) AS null_count,
       CAST(n AS BIGINT) AS numeric_count,
       mn AS min_val, mx AS max_val,
       {derived}
FROM p
"""


def grouped_profile_sql(table: str = "events", key: str = "event_type",
                        value_col: str = "value") -> str:
    """Oracle for streaming/profile_stream.grouped_profile: the windowed
    oracle with the time bucket replaced by a dimension key."""
    from flink_descriptive_stats_spark.streaming.profile_stream import (
        WINDOW_STATS)
    derived = ",\n       ".join(_derived_sql(WINDOW_STATS))
    return f"""
WITH b AS (SELECT {key} AS k, CAST({value_col} AS DOUBLE) AS x FROM {table}),
m AS (SELECT k, avg(x) AS mu FROM b GROUP BY k),
a AS (
  SELECT b.k, count(*) AS row_count, count(x) AS n,
         count(*) FILTER (WHERE x IS NULL) AS null_count,
         min(x) AS mn, max(x) AS mx, avg(x) AS mean,
         sum(pow(x - mu, 2)) AS m2, sum(pow(x - mu, 3)) AS m3,
         sum(pow(x - mu, 4)) AS m4
  FROM b JOIN m ON b.k IS NOT DISTINCT FROM m.k GROUP BY b.k
),
p AS (SELECT *, {_PRE_DERIVED_CASES} FROM a)
SELECT k AS {key},
       CAST(row_count AS BIGINT) AS row_count,
       CAST(null_count AS BIGINT) AS null_count,
       CAST(n AS BIGINT) AS numeric_count,
       mn AS min_val, mx AS max_val,
       {derived}
FROM p
"""


def completeness_sql(table: str) -> str:
    conds = []
    for col, ts in TABLE_SCHEMAS[table]:
        cond = f"{col} IS NOT NULL"
        if ts == "string":
            cond += f" AND trim({col}) <> ''"
        conds.append(f"({cond})")
    pred = " AND ".join(conds)
    return (f"SELECT CAST(count(*) AS BIGINT) AS row_count, "
            f"CAST(count(*) FILTER (WHERE {pred}) AS BIGINT) AS complete_count "
            f"FROM {table}")
