"""Data-layout operators: Z-order clustering for multi-dimensional file
skipping (engine extension; the lakehouse-maintenance companion to
``sinks.sorted_export`` and ``versioned.compact``).

A single-column sort gives perfect min/max file pruning on that column
and none on any other.  Z-ordering interleaves the bits of several
columns' range-bucket ranks into one integer and sorts by THAT, so each
file covers a small hyper-rectangle of the key space -- min/max pruning
then works on EVERY participating column at once (the Delta/Iceberg
OPTIMIZE ZORDER BY idea, from Morton-order spatial indexing).

All math is integer expressions (range buckets from a global min/max
aggregate, shift/mask bit interleave) so the mapping is deterministic
and has an exact DuckDB oracle twin.  At 100 TB the global min/max is a
metadata-cheap aggregate (or comes from table stats); NO global sort or
single-partition window is involved -- the bucket mapping is row-local,
and the write is the same repartitionByRange shape as sorted_export.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scratch import scratch_dir

ZORDER_BITS = 8  # 256 buckets per dimension -> 16-bit z-value


def _interleave_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """SQL expression interleaving the low ``bits`` bits of ``a`` (odd
    positions) and ``b`` (even positions) -- identical text works in
    Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def zorder_events(events: DataFrame, bits: int = ZORDER_BITS) -> DataFrame:
    """Assign each event its Z-order key over (user_id, value):
    range-bucket both dimensions into ``2^bits`` cells using the global
    min/max (value via exact cents so the bucketing is integer math on
    every engine), then bit-interleave the bucket ranks.

    Scale: one tiny global aggregate (min/max, broadcast back), then a
    row-local projection -- no shuffle beyond the broadcast; the z-value
    feeds ``zorder_write`` the way a sort key feeds sorted_export."""
    n = 1 << bits
    cents = F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")
    bounds = events.agg(
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.min(cents).alias("min_c"),
        F.max(cents).alias("max_c"),
    )
    with_bounds = events.select("event_id", "user_id", cents.alias("v_cents")).crossJoin(
        F.broadcast(bounds)
    )
    u_bucket = F.expr(f"CAST(((user_id - min_u) * {n}) DIV (max_u - min_u + 1) AS BIGINT)")
    v_bucket = F.expr(f"CAST(((v_cents - min_c) * {n}) DIV (max_c - min_c + 1) AS BIGINT)")
    bucketed = with_bounds.select(
        "event_id",
        u_bucket.alias("user_bucket"),
        v_bucket.alias("value_bucket"),
    )
    z = F.expr(_interleave_sql("user_bucket", "value_bucket", bits))
    return bucketed.select(
        "event_id", "user_bucket", "value_bucket", z.cast("long").alias("zvalue")
    ).orderBy("event_id")


def zorder_write(
    spark: SparkSession,
    events: DataFrame,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> str:
    """Write events clustered by z-value: repartitionByRange on the
    z-key + sortWithinPartitions, so each output file covers a compact
    hyper-rectangle of (user_id, value) space and min/max pruning works
    on both columns.  Returns the written path."""
    keyed = events.join(
        zorder_events(events, bits=bits).select("event_id", "zvalue"), "event_id"
    )
    path = os.path.join(scratch_dir("rtfl_zorder_"), "t")
    (
        keyed.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def file_skipping_report(
    spark, events, threshold: float = 450.0
):
    """Data-skipping audit: write the event table day-partitioned (one
    file per day), read each file's parquet FOOTER min/max statistics
    for the value column -- a pure metadata read, no data scan -- and
    report, per file, whether the predicate ``value >= threshold`` could
    skip it entirely (v_max < threshold).  This is the zone-map /
    Delta-stats mechanic that lets a 100 TB scan touch only the files a
    filter can hit; the oracle recomputes the per-day ranges from the
    raw rows, proving the footer stats are exact.

    Scale: the report is O(files) driver-side footer reads (the same
    metadata path delete_where's pruning uses); the data writes once
    through a day-repartition so each partition folder holds exactly one
    file."""
    import os

    from pyspark.sql import functions as F

    from ..scratch import scratch_dir
    from .versioned import _file_column_range

    out_dir = scratch_dir("rtfl_skip_")
    (
        events.withColumn("day", F.date_format(F.col("ts"), "yyyy-MM-dd"))
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out_dir)
    )
    rows = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("day="):
            continue
        day = name.split("=", 1)[1]
        pdir = os.path.join(out_dir, name)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) == 1, f"expected one file per day partition, got {files}"
        path = os.path.join(pdir, files[0])
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        rng = _file_column_range(path, "value")
        rows.append((day, md.num_rows, rng[0], rng[1], rng[1] < threshold))
    return spark.createDataFrame(
        rows, "day string, n_rows long, v_min double, v_max double, can_skip boolean"
    ).orderBy("day")
