"""Full-registry oracle parity sweep at the driver's scale factor.

Replicates the external correctness gate (row count + schema +
order-insensitive value hash vs DuckDB on the same parquet) for EVERY
registered query — not just the first 50 the driver checks — at sf0.01
by default.  Run before ending a round:

    python scripts/parity_sweep.py [sf_dir]

Writes a JSON report to PARITY_SWEEP.json at the repo root and exits
non-zero if any oracle-twinned query mismatches.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_financial_lakehouse_spark import registry  # noqa: E402
from real_time_financial_lakehouse_spark.oracle import check_query  # noqa: E402
from real_time_financial_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="parity-sweep")
    results: dict[str, object] = {}
    t0 = time.time()
    for name, fn in registry.QUERIES.items():
        t = time.time()
        try:
            if name in registry.ORACLE_SQL:
                problems = check_query(spark, fn, registry.ORACLE_SQL[name], sf_dir)
                results[name] = problems or "OK"
            else:
                results[name] = f"rows-only:{fn(spark, sf_dir).count()}"
        except Exception as ex:  # noqa: BLE001 - report, don't abort the sweep
            results[name] = f"EXC: {type(ex).__name__}: {ex}"[:500]
        status = results[name]
        print(f"{name}: {'OK' if status == 'OK' else status} ({time.time() - t:.1f}s)", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PARITY_SWEEP.json")
    json.dump({"sf_dir": sf_dir, "elapsed_s": round(time.time() - t0, 1), "results": results},
              open(out, "w"), indent=1, default=str)
    bad = {k: v for k, v in results.items()
           if v != "OK" and not str(v).startswith("rows-only")}
    print(f"TOTAL {time.time() - t0:.0f}s; {len(results)} queries; BAD: {len(bad)}")
    for k, v in bad.items():
        print(f"  {k} -> {v}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
