"""Batch sinks: CTAS table materialization and CSV export (SURVEY S7/S9).

The reference materializes gold as a dbt ``materialized='table'`` CTAS
(dbt_project/models/gold_market_summary.sql:1) and exports CSV from the
dashboard (dashboard.py:86).  Spark-side: ``saveAsTable`` against the
session catalog for CTAS, distributed ``df.write.csv`` (not a driver-side
``toPandas().to_csv`` -- at 100 TB the export itself must be parallel).

Both helpers round-trip so the sink is part of the checked dataflow: the
query result is written, read back, and the read-back DataFrame returned
-- the oracle then verifies values *through* the sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from ..scratch import scratch_dir

def ctas(spark: SparkSession, df: DataFrame, table: str) -> DataFrame:
    """CREATE-OR-REPLACE-TABLE-AS-SELECT into the session catalog, backed
    by parquet at an explicit location (works on a plain in-memory catalog,
    no Hive metastore needed).  Returns the re-read table."""
    path = os.path.join(scratch_dir("rtfl_ctas_"), table)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .saveAsTable(table)
    )
    return spark.table(table)

def partitioned_write(
    df: DataFrame, partition_cols: list[str], path: str | None = None
) -> str:
    """Hive-style partitioned parquet write -- the physical layout that
    makes time/partition pruning work at 100 TB: a filter on the partition
    column prunes directories before any file is opened.  Returns the
    written path."""
    path = path or os.path.join(scratch_dir("rtfl_part_"), "t")
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    return path

def bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> str:
    """Bucketed saveAsTable: rows pre-shuffled into ``n_buckets`` files by
    ``bucket_col``.  Two tables bucketed the same way join WITHOUT a
    shuffle (SortMergeJoin over bucketed scans, no Exchange) -- the
    standing-workload answer to the fact-to-fact shuffle called out in
    SCALE.md.  Returns the table name."""
    path = os.path.join(scratch_dir("rtfl_bucket_"), table)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )
    return table

def csv_roundtrip(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Distributed CSV export + schema-preserving re-import.  Columns must
    be CSV-stable types (string/numeric); callers format timestamps to
    strings first -- same contract as any external CSV consumer."""
    path = os.path.join(scratch_dir("rtfl_csv_"), "out")
    df.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(df.schema).option("header", True).csv(path)

def sorted_export(spark: SparkSession, df: DataFrame, sort_cols: list[str]) -> DataFrame:
    """Total-order distributed export: ``repartitionByRange`` assigns
    contiguous key ranges to partitions (one sampling pass builds the
    range bounds), ``sortWithinPartitions`` orders inside each -- files
    read back in partition order form one globally sorted dataset WITHOUT
    funneling every row through a single task.

    Scale: this is how a 100 TB sorted extract actually ships -- a global
    ``orderBy`` into one output file serializes the write; range
    partitioning keeps the write parallel at the cost of one extra
    sampling job.  Skewed sort keys produce skewed ranges; the sampler
    handles mild skew, degenerate keys (one value dominating) need a
    salt column appended to the sort key."""
    path = os.path.join(scratch_dir("rtfl_sorted_"), "out")
    (
        df.repartitionByRange(8, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)
