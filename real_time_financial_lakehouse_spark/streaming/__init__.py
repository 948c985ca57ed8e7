"""Structured Streaming medallion: bronze ingest -> silver windowed aggs.

One aggregation code path (operators/silver.py) runs in both batch and
streaming mode; this package adds the streaming wrappers: sources,
watermarks, foreachBatch sinks, checkpoints, triggers.
"""

from contextlib import contextmanager

from pyspark.sql import SparkSession

@contextmanager
def pinned_state_partitions(spark: SparkSession, n: int = 8):
    """Yield a CHILD session (shared SparkContext, independent SQLConf)
    with ``spark.sql.shuffle.partitions`` pinned: every stateful operator
    materializes one state store PER shuffle partition (stream-stream
    joins: four), so at local test scale 32 partitions means
    checkpoint/file churn dominates the micro-batch.  The partitioning is
    fixed at stream start and carried in the checkpoint -- a real
    deployment sizes it to the cluster once per checkpoint lifetime
    (repartitioning state needs an offline rewrite, e.g. the state-store
    repartition tool).

    A child session instead of a set/restore on the caller's conf:
    mutating the shared session is not concurrency-safe (a batch query
    planned during the window would silently pick up the streaming
    partition count).  The streaming DataFrame must be BUILT from the
    yielded session for the pin to apply -- conf is resolved from the
    DataFrame's own session at query start."""
    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", str(n))
    # correctness confs the stream source depends on, restated because a
    # child of a vanilla (driver-built) session inherits neither
    child.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    child.conf.set("spark.sql.session.timeZone", "UTC")
    yield child
