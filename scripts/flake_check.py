"""Repeated-parity flake shaker: run one (or more) queries' oracle
parity check N times at one or more sf dirs, with a FRESH comparison
each iteration, to expose scheduling-order float nondeterminism
(the min_variance_portfolio class of bug).

Usage:
    python scripts/flake_check.py min_variance_portfolio [more...] \
        --reps 20 --sf /root/testdata/sf0.001 --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from real_time_financial_lakehouse_spark import registry
from real_time_financial_lakehouse_spark.oracle import check_query


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names; empty = ALL registered")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--sf", action="append", default=[])
    ap.add_argument("--shuffle-partitions", type=int, default=8)
    args = ap.parse_args()
    names = args.names or sorted(registry.ORACLE_SQL)
    sfs = args.sf or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("flake-check")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name in names:
        for sf in sfs:
            for i in range(args.reps):
                problems = check_query(
                    spark, registry.QUERIES[name], registry.ORACLE_SQL[name], sf
                )
                tag = "OK " if not problems else "FAIL"
                if problems:
                    failures += 1
                    print(f"{tag} {name} {sf} rep={i + 1}: {problems}", flush=True)
                else:
                    print(f"{tag} {name} {sf} rep={i + 1}", flush=True)
    print(f"total failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
