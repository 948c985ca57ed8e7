"""Oracle-harness determinism guard (round 12).

DuckDB 1.0.0's ``list_reduce`` with a LIST-typed accumulator over padded
LIST elements returns THREAD-COUNT-DEPENDENT results (found when the
pairs_spread_backtest oracle disagreed with itself across runs; each
thread count is internally stable, so a single-config flake shake can
never catch it).  The driver runs DuckDB with its own thread defaults,
so every oracle that folds sequential state must give the same answer
at any parallelism.

This test executes each fold-bearing oracle (``list_reduce`` /
``WITH RECURSIVE``) at threads=1 and threads=8 on the smoke fixture and
asserts identical normalized results -- the mechanical version of the
SCALE.md rule "sequential multi-slot oracle state goes in a recursive
CTE, not a list-accumulator list_reduce".
"""

from __future__ import annotations

import duckdb
import pytest

from real_time_financial_lakehouse_spark import registry
from real_time_financial_lakehouse_spark.catalog import TABLE_NAMES
from real_time_financial_lakehouse_spark.oracle import normalize

from conftest import SF_SMOKE

FOLD_ORACLES = sorted(
    n
    for n, sql in registry.ORACLE_SQL.items()
    if "list_reduce" in sql or "WITH RECURSIVE" in sql
)


def _run(sql: str, threads: int):
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return normalize(con.execute(sql).fetchdf())


def test_fold_oracle_inventory_is_nonempty():
    # the guard must actually be guarding something; if the fold idiom
    # disappears from every oracle this test should be retired, not
    # silently green
    assert len(FOLD_ORACLES) >= 10


@pytest.mark.parametrize("name", FOLD_ORACLES)
def test_fold_oracle_stable_across_thread_counts(name):
    sql = registry.ORACLE_SQL[name]
    assert _run(sql, 1) == _run(sql, 8), (
        f"{name}: oracle result depends on DuckDB thread count -- "
        "rewrite the sequential state as a recursive CTE (SCALE.md, "
        "round-12 list_reduce hazard)"
    )
