"""Structured Streaming medallion: bronze ingest -> silver windowed aggs.

One aggregation code path (operators/silver.py) runs in both batch and
streaming mode; this package adds the streaming wrappers: sources,
watermarks, foreachBatch sinks, checkpoints, triggers.
"""

from contextlib import contextmanager

from pyspark.sql import SparkSession

@contextmanager
def pinned_state_partitions(spark: SparkSession, n: int = 8):
    """Pin ``spark.sql.shuffle.partitions`` for the duration of a
    streaming query start: every stateful operator materializes one state
    store PER shuffle partition (stream-stream joins: four), so at local
    test scale 32 partitions means checkpoint/file churn dominates the
    micro-batch.  The partitioning is fixed at stream start and carried
    in the checkpoint -- a real deployment sizes it to the cluster once
    per checkpoint lifetime (repartitioning state needs an offline
    rewrite, e.g. the state-store repartition tool)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
