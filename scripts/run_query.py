"""Run any named engine query from the command line.

    python scripts/run_query.py gold_market_summary
    python scripts/run_query.py dollar_bars --sf /root/testdata/sf0.01 --limit 5
    python scripts/run_query.py --list
    python scripts/run_query.py cci_20 --explain

Prints the result (or the formatted physical plan with --explain) for
quick interactive use -- the "switch one query over and eyeball it" path
for someone migrating from the reference stack.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name from the registry")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="fixture dir")
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument("--list", action="store_true", help="list query names")
    ap.add_argument("--explain", action="store_true", help="show the plan only")
    args = ap.parse_args()

    from real_time_financial_lakehouse_spark import registry

    if args.list or not args.name:
        for n in registry.QUERIES:
            mark = " " if n in registry.ORACLE_SQL else "*"
            print(f"{mark} {n}")
        print(f"\n{len(registry.QUERIES)} queries (* = rows-only, no SQL oracle)")
        return 0
    if args.name not in registry.QUERIES:
        import difflib

        close = difflib.get_close_matches(args.name, registry.QUERIES, n=5)
        print(f"unknown query {args.name!r}; close matches: {close}")
        return 2

    from real_time_financial_lakehouse_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.name}")
    df = registry.QUERIES[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
