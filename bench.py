"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` writer (full execution,
no driver collect, no sink cost) so the number reflects the distributed
plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from real_time_financial_lakehouse_spark import registry
    from real_time_financial_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="rtfl-bench")

    # Warm the JVM paths the queries exercise (codegen, vectorized parquet
    # reader + footer cache, broadcast machinery) so per-query numbers
    # measure the plan, not one-time initialization.
    from pyspark.sql import functions as F

    from real_time_financial_lakehouse_spark.catalog import load_tables

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tables = load_tables(spark, sf_dir)
    for df in tables.values():
        df.count()
    small = spark.range(100).withColumnRenamed("id", "k")
    spark.range(10_000).join(F.broadcast(small), F.col("id") == F.col("k")).count()

    # Two runs per query, report the min: the first run pays one-time
    # whole-stage-codegen (Janino) compilation for that plan shape, a cost
    # any long-running cluster amortizes; the min reflects the steady-state
    # distributed execution the engine is designed around.
    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "rtfl_query_inventory_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()

if __name__ == "__main__":
    sys.exit(main())
