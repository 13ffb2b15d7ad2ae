"""Write-side data layout for scale: partitioned and bucketed parquet.

The reference's only sinks are collect/console (ProfileJob.java:115-143);
at 100 TB the write path IS the performance feature, so the engine ships
the two layouts that delete shuffles downstream:

- ``write_partitioned``: hive-style directory partitioning. Reads with a
  partition-key predicate scan only matching directories (partition
  pruning — visible as PartitionFilters in the plan), the first lever for
  time/tenant/split-keyed corpora.
- ``write_bucketed``: hash-bucketed (optionally sorted) table layout.
  Two tables bucketed on the same key join WITHOUT any Exchange: the scan
  itself provides the hash distribution, so the 100 TB join cost drops to
  a per-bucket merge. This is the materialized form of "pre-shuffle once,
  join many times" — the right call for a corpus joined repeatedly on
  doc_id (dedup verdicts, quality scores, embedding features).

Bucketing uses the session catalog (``saveAsTable`` — Spark's bucketing
metadata lives in the table, not the files), so callers address the result
by table name; plain parquet paths cannot carry bucket info.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Directory-partitioned parquet: one dir per distinct partition-col
    tuple. Keep partition columns low-cardinality (file-count explosion is
    the classic failure); high-cardinality keys belong in bucketing."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 8, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Hash-bucketed (and optionally per-bucket sorted) managed table.
    ``num_buckets`` bounds per-bucket size at the target scale (aim for
    O(100 MB-1 GB) per bucket file); sorting enables merge-joins without a
    per-query sort."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets,
                                                       *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_sorted_shards(df: DataFrame, path: str, sort_cols: list[str],
                        num_shards: int = 8,
                        mode: str = "overwrite") -> None:
    """Globally-sorted sharded parquet — the training-shard layout: shard
    i's every key precedes shard i+1's, and rows are sorted inside each
    shard file.

    ``repartitionByRange`` samples the sort keys to build balanced range
    bounds (one RangePartitioning exchange — skewed keys get split across
    shards by the sampler, unlike hash bucketing), then
    ``sortWithinPartitions`` sorts shard-locally with NO extra exchange —
    a global sort's output layout at a partial sort's shuffle cost. Readers
    that process shards in filename order stream the corpus in key order;
    min/max parquet footer stats make key-range scans prune whole shards."""
    (df.repartitionByRange(num_shards, *sort_cols)
     .sortWithinPartitions(*sort_cols)
     .write.mode(mode).parquet(path))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata applies automatically)."""
    return spark.table(table)
