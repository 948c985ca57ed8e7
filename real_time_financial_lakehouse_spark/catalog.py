"""Fixture-table catalog: parquet loaders for /root/testdata/sf*/.

All reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning.  The one special case is
``events``: its parquet footer declares TIMESTAMP(NANOS), which Spark's
vectorized reader rejects, so the session sets
``spark.sql.legacy.parquet.nanosAsLong=true`` and this loader converts the
nano-long back to a microsecond TimestampType (integer division floors,
matching DuckDB's ns->us truncation so oracle comparisons agree).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin semantics at read time so the engine behaves identically on
    # sessions it didn't build (the correctness driver constructs its own
    # plain SparkSession): UTC wall-clock, and tolerate either fixture
    # vintage -- TIMESTAMP(NANOS) (rounds 1-2) or plain microsecond
    # NTZ-annotated timestamps (round 3 regeneration).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos long -> microsecond timestamp.  Integer DIV, not `/`: the
        # nano epoch (~1.7e18) exceeds double's exact-integer range, so
        # float division would drift by microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # NTZ-annotated fixture timestamps read back as TIMESTAMP_NTZ, which
    # breaks instant-typed functions (unix_millis, to_utc_timestamp) and
    # streaming watermarks.  With the session pinned to UTC the cast
    # preserves the wall-clock, so results match DuckDB's naive reads.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df

def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}

def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
