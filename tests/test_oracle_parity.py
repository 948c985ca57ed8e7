"""Differential test: every registered query vs its DuckDB oracle twin.

This replicates the driver's t2 correctness gate (row-count + schema +
order-insensitive values) at sf0.001 so regressions surface in seconds.
"""

from __future__ import annotations

import pytest

from real_time_financial_lakehouse_spark import registry
from real_time_financial_lakehouse_spark.oracle import check_query

from conftest import SF_SMOKE

ORACLE_CASES = sorted(registry.ORACLE_SQL)

@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, name):
    problems = check_query(spark, registry.QUERIES[name], registry.ORACLE_SQL[name], SF_SMOKE)
    assert not problems, f"{name}: " + "; ".join(problems)

def test_every_query_has_rows(spark):
    for name, fn in registry.QUERIES.items():
        assert fn(spark, SF_SMOKE).count() >= 0, name

def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "symbol" in df.columns
