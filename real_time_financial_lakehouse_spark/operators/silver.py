"""Silver-layer aggregation: sliding event-time windows over trades.

The reference's core stateful query (process_silver.py:50-57):
``groupBy(window(ts, "1 minute", "30 seconds"), symbol)
  .agg(stddev_pop(price) AS volatility, avg(price) AS average_price)``
with a 1-minute watermark.  The *same expression* runs in two modes here:

* batch (this module) -- used for oracle-checked correctness, backfill,
  and reprocessing;
* streaming (streaming/silver.py) -- wraps the identical builder in
  readStream/writeStream with watermark + foreachBatch.

One code path, two execution modes is the idiomatic Structured Streaming
design and guarantees batch backfill agrees with live results.

Scale notes: sliding windows duplicate each event into window/slide = 2
groups before the shuffle; partial aggregation still applies, so shuffle
volume is 2x|groups|, not 2x|rows|.  stddev_pop is kept *pop* (not sample)
deliberately -- single-row windows yield 0.0, not NULL
(process_silver.py:54; SURVEY hard-part 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import qround

def sliding_window_agg(
    trades: DataFrame,
    window: str = "1 minute",
    slide: str = "30 seconds",
    time_col: str = "ts",
    symbol_col: str = "event_type",
    price_col: str = "value",
) -> DataFrame:
    """A1/A2/T2: sliding-window volatility + mean, batch mode.

    Returns (window_start, window_end, symbol, volatility, average_price,
    n_events), ordered for deterministic display.  ``processed_time``
    (current_timestamp in the reference, process_silver.py:56) is omitted
    here because it is nondeterministic; the streaming wrapper adds it.
    """
    win: Column = F.window(F.col(time_col), window, slide)
    return (
        trades.groupBy(win.alias("w"), F.col(symbol_col).alias("symbol"))
        .agg(
            qround(F.stddev_pop(price_col), 6).alias("volatility"),
            qround(F.avg(price_col), 6).alias("average_price"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "symbol",
            "volatility",
            "average_price",
            "n_events",
        )
    )
