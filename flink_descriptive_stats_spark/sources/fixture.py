"""Replica of the reference's only test fixture.

The reference's sole verification artifact is the deterministic synthetic
table built by ``ProfileJob.getRowArray`` (ProfileJob.java:44-65, invoked at
:86 with NUM_ELEMENTS=100_000): schema (col1 Boolean, col2 String, col3
Integer), row i (first match wins):

  i % 3 == 0  -> (true,  "3",                1)
  i % 7 == 0  -> (true,  "7",                1)
  i % 11 == 0 -> (null,  "ABCDEF00X30A333Y", i)
  else        -> (true,  str(i),             i)

This exercises null counting, constant-heavy top-K, mixed character patterns
and wide numeric spread (FIXTURES.md §1). N is scalable; tests recompute
expectations for any N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FIXTURE_SCHEMA = T.StructType([
    T.StructField("col1", T.BooleanType(), True),
    T.StructField("col2", T.StringType(), False),
    T.StructField("col3", T.IntegerType(), False),
])


def reference_fixture_rows(n: int) -> list[tuple]:
    rows = []
    for i in range(n):
        if i % 3 == 0:
            rows.append((True, "3", 1))
        elif i % 7 == 0:
            rows.append((True, "7", 1))
        elif i % 11 == 0:
            rows.append((None, "ABCDEF00X30A333Y", i))
        else:
            rows.append((True, str(i), i))
    return rows


def reference_fixture_df(spark: SparkSession, n: int = 100_000,
                         num_partitions: int | None = None) -> DataFrame:
    df = spark.createDataFrame(reference_fixture_rows(n), FIXTURE_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df
