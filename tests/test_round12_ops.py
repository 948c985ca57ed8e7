"""Round-12 operator tests.

First block: the session-boundary alignment asked for by the round-11
verdict/advisor -- engine (Spark ``session_window``) and the
gaps-and-islands oracle must agree on a fixture where an event lands at
EXACTLY prev_ts + gap (the 30:00.000000 boundary).  Before round 12 the
oracle split at ``>=`` while session_window merges the touching case and
parity held only because no fixture timestamp hit the boundary; the
oracle now pins the same strict-``>`` split, so these tests prove the
alignment by construction rather than by fixture luck.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from real_time_financial_lakehouse_spark.operators import windows


def _boundary_events(spark):
    """Four users exercising every flavor of the 30-minute boundary:
    u1 gap == 30:00.000000 exactly (must MERGE -- session_window keeps
    the touching extent), u2 gap 30:00.000001 (must SPLIT), u3 gap
    29:59.999999 (must MERGE), u4 a chain of two exact-boundary gaps
    (one 3-event session)."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m30 = dt.timedelta(minutes=30)
    us1 = dt.timedelta(microseconds=1)
    rows = [
        (1, t0, 101, 10.0),
        (1, t0 + m30, 102, 20.0),                 # exactly on boundary
        (2, t0, 201, 10.0),
        (2, t0 + m30 + us1, 202, 20.0),           # just past
        (3, t0, 301, 10.0),
        (3, t0 + m30 - us1, 302, 20.0),           # just inside
        (4, t0, 401, 1.0),
        (4, t0 + m30, 402, 2.0),                  # boundary chain x2
        (4, t0 + m30 + m30, 403, 3.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )


def test_session_window_merges_exact_boundary(spark):
    """Spark session_window semantics pinned: gap == threshold MERGES."""
    out = {
        r["user_id"]: r["n"]
        for r in windows.sessionize(_boundary_events(spark))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {1: 1, 2: 2, 3: 1, 4: 1}


def test_sessionize_oracle_agrees_at_exact_boundary(spark, tmp_path):
    """Engine vs DuckDB oracle on the boundary fixture -- row-identical.

    Runs the REGISTERED sessionize_users oracle SQL (strict-> split as
    of round 12) against a parquet copy of the boundary fixture and
    compares with the engine output the same way the driver does."""
    from real_time_financial_lakehouse_spark import registry
    from real_time_financial_lakehouse_spark.oracle import normalize, run_oracle

    ev = _boundary_events(spark)
    # materialize a minimal sf-dir with just the events table; the
    # sessionize oracle touches only `events`
    sf = str(tmp_path / "sf_boundary")
    ev.coalesce(1).write.parquet(f"{sf}/events.parquet")
    spark_rows = normalize(windows.sessionize(ev).toPandas())

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    oracle_rows = normalize(
        con.execute(registry.ORACLE_SQL["sessionize_users"]).fetchdf()
    )
    assert spark_rows == oracle_rows


def test_streaming_islands_rule_matches_session_window(spark):
    """The streaming_session_merge islands rule (strict ``>`` on
    interval rows) reproduces session_window's boundary behavior on the
    same fixture -- the cross-batch merge cannot diverge from the batch
    twin at the exact boundary."""
    from pyspark.sql import Window

    ev = _boundary_events(spark)
    rows = ev.select(
        "user_id",
        F.col("ts").alias("s_start"),
        F.col("ts").alias("s_end"),
        F.lit(1).cast("long").alias("n_events"),
    )
    w = Window.partitionBy("user_id").orderBy("s_start", "s_end")
    prev_max_end = F.max("s_end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = rows.withColumn(
        "new_s",
        F.when(
            prev_max_end.isNull()
            | (F.col("s_start") > prev_max_end + F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    chained = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    islands = {
        r["user_id"]: r["n"]
        for r in chained.groupBy("user_id")
        .agg(F.countDistinct("sid").alias("n"))
        .collect()
    }
    assert islands == {1: 1, 2: 2, 3: 1, 4: 1}


def test_fixture_has_no_exact_boundary_gap(spark, sf_dir):
    """Sentinel (round-11 verdict 'What's wrong' #1): the alignment
    above makes boundary gaps harmless, but this documents fixture
    reality and will flag a regeneration that starts landing events on
    the exact 30:00.000000 per-user gap so the parity evidence can be
    re-read in that light."""
    from real_time_financial_lakehouse_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).where(F.col("gap_us") == 30 * 60 * 1_000_000)
    n = gaps.count()
    # not an assertion of impossibility -- alignment makes it harmless --
    # but any nonzero count should be a loud, conscious observation
    assert n == 0, (
        f"{n} per-user gaps land on exactly 30:00.000000; harmless since "
        "the round-12 oracle alignment, but re-verify session parity"
    )


# ---------------------------------------------------------------------------
# kendall_tau_windowed -- the long-calendar scale twin (r11 verdict ask #3)
# ---------------------------------------------------------------------------

import math

from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators import finance


def _qr(x: float, d: int = 6) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def test_kendall_windowed_matches_python_on_fixture(spark, sf_dir):
    """Per-(pair, month) tau-b and the n0-weighted rollup re-derived in
    plain Python from the fixture ticks."""
    ev = load_table(spark, sf_dir, "events")
    rows = finance.kendall_tau_windowed(ev).collect()
    assert rows
    pdf = (
        ev.toPandas()
        .query("value > 0")
        .sort_values(["ts", "event_id"])
        .assign(day=lambda d: d["ts"].dt.floor("D"))
    )
    series = {}
    for sym in pdf.event_type.unique():
        g = pdf[pdf.event_type == sym]
        closes = g.groupby("day").last()["value"].sort_index()
        import numpy as np

        lr = np.log(closes / closes.shift(1)).dropna()
        lr = np.floor(lr * 1e12 + 0.5) / 1e12
        series[sym] = dict(zip(closes.index[1:], lr))
    for r in rows[:4]:
        sa, sb = series[r["sym_a"]], series[r["sym_b"]]
        days = sorted(set(sa) & set(sb))
        by_month = {}
        for d in days:
            by_month.setdefault((d.year, d.month), []).append((sa[d], sb[d]))
        n_windows = n0_total = 0
        wsum_u = 0
        for pairs in by_month.values():
            C = D = ta = tb = 0
            n0 = len(pairs) * (len(pairs) - 1) // 2
            for i in range(len(pairs)):
                for j in range(i + 1, len(pairs)):
                    da = pairs[i][0] - pairs[j][0]
                    db = pairs[i][1] - pairs[j][1]
                    if da * db > 0:
                        C += 1
                    elif da * db < 0:
                        D += 1
                    if da == 0:
                        ta += 1
                    if db == 0:
                        tb += 1
            denom = math.sqrt((n0 - ta) * (n0 - tb))
            if denom > 0:
                tau_u = math.floor((C - D) / denom * 1e12 + 0.5)
                n_windows += 1
                n0_total += n0
                wsum_u += tau_u * n0
        assert (r["n_windows"], r["n0_total"]) == (n_windows, n0_total)
        assert r["kendall_tau_b_wavg"] == pytest.approx(
            _qr((wsum_u / 1e12) / n0_total, 6), abs=1e-9
        )


def test_kendall_windowed_agrees_with_full_matrix_within_one_month(spark):
    """On a fixture that spans a single calendar month the windowed twin
    IS the full matrix (one window, weight = all pairs)."""
    import datetime as _dt

    rows, ca, cb = [], 100.0, 200.0
    steps = [0.01, -0.02, 0.03, -0.005, 0.015, -0.01, 0.02, 0.004]
    rows.append((1, _dt.datetime(2024, 3, 1, 12), 1, "aaa", ca, None))
    rows.append((2, _dt.datetime(2024, 3, 1, 12), 1, "bbb", cb, None))
    for i, s in enumerate(steps):
        ca *= math.exp(s)
        cb *= math.exp(-0.5 * s)
        ts = _dt.datetime(2024, 3, 2, 12) + _dt.timedelta(days=i)
        rows.append((2 * i + 3, ts, 1, "aaa", ca, None))
        rows.append((2 * i + 4, ts, 1, "bbb", cb, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    full = finance.kendall_tau_matrix(ev).collect()[0]
    win = finance.kendall_tau_windowed(ev).collect()[0]
    assert win["n_windows"] == 1
    assert win["n0_total"] == full["n0"]
    assert win["kendall_tau_b_wavg"] == pytest.approx(
        full["kendall_tau_b"], abs=1e-6
    )
