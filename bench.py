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

    # Warm the JVM/codegen path once so per-query numbers measure the plan.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
