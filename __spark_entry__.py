"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship gold-rollup query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the SURVEY section-2 operator
inventory implemented in ``real_time_financial_lakehouse_spark`` with
DuckDB-oracle SQL twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_financial_lakehouse_spark import registry
from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators.rollup import events_market_summary

SMOKE_SF_DIR = "/root/testdata/sf0.001"

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, SMOKE_SF_DIR, "events")
    return events_market_summary(events)

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2.

    Rotation is re-applied here (idempotent) so the driver's first-50
    window is correct regardless of module IMPORT order: if
    registry_llmdata is imported before registry (their import is
    circular), the module-end rotation would have run over a partially
    populated registry."""
    registry._rotate_for_driver()
    return dict(registry.QUERIES)

def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    registry._rotate_for_driver()
    return dict(registry.ORACLE_SQL)
