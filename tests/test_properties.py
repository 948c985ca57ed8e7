"""Property-based invariants (SURVEY section 5.5): relationships that must
hold for ANY input, which the fixed-fixture oracle tests can't establish.
Kept to few examples per property -- each example spins Spark jobs."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_financial_lakehouse_spark.operators.rollup import events_market_summary
from real_time_financial_lakehouse_spark.operators.silver import sliding_window_agg
from real_time_financial_lakehouse_spark.operators.windows import ema_per_symbol

BASE_TS = dt.datetime(2024, 1, 1)

event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),          # ts offset seconds
        st.sampled_from(["click", "view", "purchase"]),       # event_type
        st.floats(min_value=0.01, max_value=1000.0, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
)

_few = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

def _events_df(spark, rows):
    data = [
        (i, BASE_TS + dt.timedelta(seconds=off), i % 7, etype, float(val), "{}")
        for i, (off, etype, val) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )

@_few
@given(rows=event_rows)
def test_gold_rollup_invariants(spark, rows):
    df = _events_df(spark, rows)
    out = events_market_summary(df).collect()
    # every input row lands in exactly one (symbol, minute) group
    assert sum(r["transaction_count"] for r in out) == len(rows)
    for r in out:
        assert r["min_price"] <= r["avg_price"] <= r["max_price"]
        assert r["volatility"] >= 0.0

@_few
@given(rows=event_rows)
def test_sliding_window_double_counts(spark, rows):
    df = _events_df(spark, rows)
    out = sliding_window_agg(df).collect()
    # 60s window / 30s slide: every event belongs to exactly 2 windows
    assert sum(r["n_events"] for r in out) == 2 * len(rows)
    for r in out:
        assert r["volatility"] >= 0.0

@_few
@given(rows=event_rows)
def test_ema_is_convex_combination(spark, rows):
    df = _events_df(spark, rows)
    out = ema_per_symbol(df).collect()
    assert sum(r["n_events"] for r in out) == len(rows)
    by_symbol = df.groupBy("event_type").agg(F.min("value"), F.max("value")).collect()
    bounds = {r[0]: (r[1], r[2]) for r in by_symbol}
    eps = 1e-6  # qround quantum
    for r in out:
        lo, hi = bounds[r["symbol"]]
        assert lo - eps <= r["ema"] <= hi + eps

@_few
@given(rows=event_rows, threshold=st.floats(min_value=0.01, max_value=999.0))
def test_union_partition_is_lossless(spark, rows, threshold):
    df = _events_df(spark, rows)
    high = df.filter(F.col("value") >= threshold)
    low = df.filter(F.col("value") < threshold)
    assert high.unionByName(low).count() == len(rows)
