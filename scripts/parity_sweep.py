"""Full-registry oracle parity sweep at BOTH gate scale factors.

Replicates the external correctness gate (row count + schema +
order-insensitive value hash vs DuckDB on the same parquet) for EVERY
registered query — not just the first 50 the driver checks — at
sf0.001 AND sf0.01 by default.  The dual-sf rule exists because the
round-8 min_variance_portfolio flake lived only in sf0.001's degenerate
sparse-overlap pairs: an sf0.01-only sweep blessed a query that a
fresh pytest run (which checks sf0.001) then failed.  Run before
ending a round:

    python scripts/parity_sweep.py [sf_dir ...]

Writes a JSON report to PARITY_SWEEP.json at the repo root (one result
map per sf_dir) and exits non-zero if any oracle-twinned query
mismatches at any swept sf.
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

DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def sweep(spark, sf_dir: str) -> dict[str, object]:
    results: dict[str, object] = {}
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
        print(
            f"{name}: {'OK' if status == 'OK' else status} ({time.time() - t:.1f}s)",
            flush=True,
        )
    return results


def main() -> int:
    sf_dirs = sys.argv[1:] or DEFAULT_SFS
    spark = get_spark(app_name="parity-sweep")
    t0 = time.time()
    report: dict[str, object] = {"sf_dirs": sf_dirs, "sweeps": {}}
    bad: dict[str, object] = {}
    for sf_dir in sf_dirs:
        print(f"=== sweeping {sf_dir} ===", flush=True)
        results = sweep(spark, sf_dir)
        report["sweeps"][sf_dir] = results
        for k, v in results.items():
            if v != "OK" and not str(v).startswith("rows-only"):
                bad[f"{sf_dir}:{k}"] = v
    report["elapsed_s"] = round(time.time() - t0, 1)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY_SWEEP.json",
    )
    json.dump(report, open(out, "w"), indent=1, default=str)
    n = sum(len(r) for r in report["sweeps"].values())
    print(f"TOTAL {time.time() - t0:.0f}s; {n} checks across {len(sf_dirs)} sfs; BAD: {len(bad)}")
    for k, v in bad.items():
        print(f"  {k} -> {v}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
