"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Every operator from SURVEY.md §2 (plus extensions) is exposed
here; implementations live in ``flink_descriptive_stats_spark/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_descriptive_stats_spark import oracle
from flink_descriptive_stats_spark.operators import profile as prof
from flink_descriptive_stats_spark.sources.tables import load_table as _load


# --------------------------------------------------------------------------
# query implementations (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def _profile_table(table: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return prof.profile(_load(spark, sf_dir, table))
    return q


def _completeness_table(table: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return prof.complete_row_count(_load(spark, sf_dir, table))
    return q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full single-pass profile of lineitem at sf0.001."""
    return prof.profile(_load(spark, "/root/testdata/sf0.001", "lineitem"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for table in ("lineitem", "orders", "customer", "part", "events",
                  "documents", "nation"):
        q[f"profile_{table}"] = _profile_table(table)
    for table in ("lineitem", "supplier"):
        q[f"completeness_{table}"] = _completeness_table(table)
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    for table in ("lineitem", "orders", "customer", "part", "events",
                  "documents", "nation"):
        o[f"profile_{table}"] = oracle.profile_table_sql(table)
    for table in ("lineitem", "supplier"):
        o[f"completeness_{table}"] = oracle.completeness_sql(table)
    return o
