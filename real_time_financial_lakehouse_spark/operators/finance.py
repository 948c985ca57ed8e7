"""Financial indicator operators (engine extension).

The reference's dashboard computes SMA/RSI/price-delta
(dashboard.py:60-104, covered in operators/windows.py); this module adds
the other indicators a market-data gold layer serves -- VWAP, Bollinger
bands, max drawdown, inter-bar gaps -- all as built-in window/aggregate
expressions (JVM codegen, no UDF), each with an exact DuckDB twin.

Scale notes per operator in the docstrings; the common shape is one
shuffle on the symbol (tiny cardinality here, salted/AQE-handled when a
symbol is hot) and window frames bounded by row counts, so state per
task is O(frame), not O(partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import qround

def vwap_daily(events: DataFrame) -> DataFrame:
    """Volume-weighted average price per (symbol, day); volume is the
    ``k`` field of the props JSON (the fixture's stand-in for trade
    quantity).

    Scale: JSON field extraction is scan-side and codegen'd; one
    partial-aggregable groupBy shuffle.  Zero-volume days keep NULL
    VWAP explicitly (ANSI division guard)."""
    qty = F.get_json_object(F.col("props"), "$.k").cast("double")
    vsum = F.sum(qty)
    return (
        events.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.when(vsum != 0, qround(F.sum(F.col("value") * qty) / vsum, 6))
            .alias("vwap"),
            qround(vsum, 6).alias("total_volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .orderBy("symbol", "day")
    )

def bollinger_bands(events: DataFrame, n: int = 20, width: float = 2.0) -> DataFrame:
    """Bollinger bands: n-row moving average +/- width * sample stddev
    per symbol, emitted only where the window is full (the standard
    null-prefix convention, same as SMA).

    Scale: one shuffle on the symbol; the frame is ROWS-bounded so each
    task holds n rows of state per in-flight window, independent of
    partition size."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(n - 1), 0)
    )
    mid = F.avg("value").over(w)
    sd = F.stddev_samp(F.col("value")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return (
        events.select(
            "event_id",
            F.col("event_type").alias("symbol"),
            "ts",
            F.col("value").alias("price"),
            F.when(cnt == n, qround(mid, 6)).alias("bb_mid"),
            F.when(cnt == n, qround(mid + F.lit(width) * sd, 6)).alias("bb_upper"),
            F.when(cnt == n, qround(mid - F.lit(width) * sd, 6)).alias("bb_lower"),
        )
        .orderBy("symbol", "ts", "event_id")
    )

def max_drawdown(events: DataFrame) -> DataFrame:
    """Maximum drawdown per symbol: largest peak-to-trough decline of
    the price series, as a fraction of the running peak.

    Scale: the running peak is an expanding-frame window max -- Spark
    evaluates it incrementally (one value of state per task), then one
    tiny groupBy.  Single shuffle on the symbol."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("value").over(w)
    dd = F.when(peak > 0, (peak - F.col("value")) / peak).otherwise(F.lit(0.0))
    return (
        events.select(F.col("event_type").alias("symbol"), dd.alias("dd"))
        .groupBy("symbol")
        .agg(qround(F.max("dd"), 6).alias("max_drawdown"))
        .orderBy("symbol")
    )

def bar_gaps(events: DataFrame) -> DataFrame:
    """Opening gaps between consecutive minute bars per symbol: this
    bar's open minus the previous bar's close (the gap a candlestick
    chart annotates).

    Scale: composes the no-window OHLC aggregate (min_by/max_by, one
    shuffle) with a lag over the ALREADY-AGGREGATED bars -- the window
    runs on bar cardinality, not trade cardinality, so the expensive
    pass stays windowless."""
    from .rollup import minute_ohlc

    bars = minute_ohlc(events).select(
        "symbol", "minute_window", "open_price", "close_price"
    )
    w = Window.partitionBy("symbol").orderBy("minute_window")
    prev_close = F.lag("close_price").over(w)
    return (
        bars.select(
            "symbol",
            "minute_window",
            qround(F.col("open_price") - prev_close, 6).alias("gap"),
            F.when(
                prev_close > 0,
                qround((F.col("open_price") - prev_close) / prev_close, 6),
            ).alias("gap_pct"),
        )
        .filter(F.col("gap").isNotNull())
        .orderBy("symbol", "minute_window")
    )

def symbol_correlations(events: DataFrame) -> DataFrame:
    """Pairwise Pearson correlation of per-minute closing prices between
    symbols -- the cross-asset correlation matrix a risk dashboard keeps.

    Scale: the expensive pass is the minute-bar aggregate (min_by, one
    shuffle over trades); the correlation then runs on BAR cardinality:
    a self-equi-join of the bars on the minute key (both sides already
    small) and one partial-aggregable corr() per unordered pair.  The
    symbol < symbol guard halves the pair space and fixes output
    order."""
    from .rollup import minute_ohlc

    bars = minute_ohlc(events).select("symbol", "minute_window", "close_price")
    a = bars.select(
        F.col("symbol").alias("sym_a"),
        F.col("minute_window").alias("mw"),
        F.col("close_price").alias("close_a"),
    )
    b = bars.select(
        F.col("symbol").alias("sym_b"),
        F.col("minute_window").alias("mw_b"),
        F.col("close_price").alias("close_b"),
    )
    return (
        a.join(b, (F.col("mw") == F.col("mw_b")) & (F.col("sym_a") < F.col("sym_b")))
        .groupBy("sym_a", "sym_b")
        .agg(
            qround(F.corr("close_a", "close_b"), 6).alias("corr"),
            F.count(F.lit(1)).alias("n_minutes"),
        )
        .orderBy("sym_a", "sym_b")
    )

def daily_return_volatility(events: DataFrame) -> DataFrame:
    """Daily realized volatility per symbol: population stddev of
    log-returns between consecutive trades -- the annualization input
    every options desk derives first.

    Scale: one window (lag over symbol order) at trade cardinality, then
    one partial-aggregable groupBy; ln() guards non-positive prices
    explicitly (ANSI mode raises on ln(<=0))."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    log_ret = F.when(
        (F.col("value") > 0) & (prev > 0), F.log(F.col("value") / prev)
    )
    return (
        events.select(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", F.col("ts")).alias("day"),
            log_ret.alias("r"),
        )
        .filter(F.col("r").isNotNull())
        .groupBy("symbol", "day")
        .agg(
            qround(F.stddev_pop("r"), 6).alias("realized_vol"),
            F.count(F.lit(1)).alias("n_returns"),
        )
        .orderBy("symbol", "day")
    )
