"""Gold-layer rollups: the reference's dbt/DuckDB batch model, Spark-first.

Reference model (dbt_project/models/gold_market_summary.sql:3-16): scan the
silver parquet, GROUP BY (symbol, date_trunc('minute', processed_time)),
AVG/MAX/MIN/AVG/COUNT, ORDER BY minute DESC, materialized as a table
(CTAS).  In Spark this whole dbt-on-DuckDB path collapses to one
declarative plan: parquet scan -> partial (map-side) hash aggregate ->
shuffle on the two group keys -> final aggregate -> sort.

Scale notes (100 TB): the aggregate shuffles once on
(symbol, minute) -- high combined cardinality, so skew is bounded; the
map-side partial aggregation means shuffle volume is ~|groups| per task,
not |rows|.  The global ORDER BY is a range-partitioned sort over the
*aggregated* (small) output, not the raw scan.  With AQE on, the post-agg
partition count coalesces to fit the actual group count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import qround

def gold_market_summary(
    silver: DataFrame,
    symbol_col: str = "symbol",
    time_col: str = "processed_time",
    price_col: str = "average_price",
    volatility_col: str = "volatility",
) -> DataFrame:
    """Per-minute OHLC-style rollup (gold_market_summary.sql:3-16).

    Column names follow the reference's gold schema.  Double aggregates are
    rounded to 6 decimals so results are bit-stable across engines
    (summation order differs between Spark partial aggregation and any
    single-node oracle; rounding removes the ulp noise).
    """
    return (
        silver.groupBy(
            F.col(symbol_col).alias("symbol"),
            F.date_trunc("minute", F.col(time_col)).alias("minute_window"),
        )
        .agg(
            qround(F.avg(price_col), 6).alias("avg_price"),
            qround(F.max(price_col), 6).alias("max_price"),
            qround(F.min(price_col), 6).alias("min_price"),
            qround(F.avg(volatility_col), 6).alias("avg_volatility"),
            F.count(F.lit(1)).alias("transaction_count"),
        )
        .orderBy(F.col("minute_window").desc(), F.col("symbol"))
    )

def events_market_summary(events: DataFrame) -> DataFrame:
    """Flagship query: the gold rollup shape applied to the ``events``
    fixture (event_type plays symbol, value plays price), with volatility
    computed inline as stddev_pop(value) per group, matching the silver
    layer's volatility definition (process_silver.py:54)."""
    return (
        events.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("minute", F.col("ts")).alias("minute_window"),
        )
        .agg(
            qround(F.avg("value"), 6).alias("avg_price"),
            qround(F.max("value"), 6).alias("max_price"),
            qround(F.min("value"), 6).alias("min_price"),
            qround(F.stddev_pop("value"), 6).alias("volatility"),
            F.count(F.lit(1)).alias("transaction_count"),
        )
        .orderBy(F.col("minute_window").desc(), F.col("symbol"))
    )

def minute_bars_unsorted(events: DataFrame) -> DataFrame:
    """The OHLC aggregation of ``minute_ohlc`` without the presentation
    sort -- the form downstream re-aggregations (``hourly_from_minute``)
    consume, so the cascade doesn't inherit a pointless range-shuffle +
    global sort between the two grouping passes."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("minute", F.col("ts")).alias("minute_window"),
        )
        .agg(
            F.min_by(F.col("value"), key).alias("open_price"),
            qround(F.max("value"), 6).alias("high_price"),
            qround(F.min("value"), 6).alias("low_price"),
            F.max_by(F.col("value"), key).alias("close_price"),
            qround(F.sum("value"), 6).alias("total_value"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


def minute_ohlc(events: DataFrame) -> DataFrame:
    """True OHLC bars per (event_type, minute): open/close need ordered
    first/last semantics, expressed with min_by/max_by over a composite
    (ts, event_id) tiebreak so results are deterministic even with
    duplicate timestamps.  min_by/max_by stay inside whole-stage codegen --
    no window shuffle, one aggregate pass."""
    return minute_bars_unsorted(events).orderBy(
        F.col("minute_window"), F.col("symbol")
    )

def daily_rollup_totals(events: DataFrame) -> DataFrame:
    """ROLLUP (symbol, day): detail rows + per-symbol subtotals + grand
    total in one pass -- the OLAP cube slice a gold layer serves to BI.

    Scale: Spark expands grouping sets before the exchange, so partial
    aggregation still applies per set; one shuffle.  ``grouping_id``
    disambiguates subtotal NULLs from data NULLs."""
    day = F.date_trunc("day", F.col("ts"))
    return (
        events.rollup(F.col("event_type").alias("symbol"), day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            qround(F.sum("value"), 2).alias("total_value"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(F.col("gid"), F.col("symbol"), F.col("day"))
    )

def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact percentiles (p50/p90/p99) per symbol -- the latency/price
    distribution summary.  ``percentile`` is exact (full sort per group);
    the 100 TB path swaps in ``percentile_approx`` (KLL-sketch, mergeable,
    one pass) when exactness is not contractual -- same query shape."""
    pcts = F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))")
    return (
        events.groupBy(F.col("event_type").alias("symbol"))
        .agg(pcts.alias("p"))
        .select(
            "symbol",
            qround(F.element_at("p", 1), 6).alias("p50"),
            qround(F.element_at("p", 2), 6).alias("p90"),
            qround(F.element_at("p", 3), 6).alias("p99"),
        )
        .orderBy("symbol")
    )

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

def event_type_pivot(events: DataFrame) -> DataFrame:
    """PIVOT: per-user event counts spread into one column per event type.
    The value list is explicit, so Spark skips the extra distinct-values
    job and the output schema is static -- required for a 100 TB input
    (a dynamic pivot would scan once just to learn the columns)."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, subset=EVENT_TYPES)
        .orderBy("user_id")
    )

def distinct_user_counts(events: DataFrame) -> DataFrame:
    """COUNT(DISTINCT) per group -- Spark plans this as a two-phase
    expand/aggregate (partial distinct per partition, then merge), so the
    shuffle carries distinct keys only.  The 100 TB path swaps in
    ``approx_count_distinct`` (HyperLogLog++, mergeable sketch, one pass,
    no expand) when +-2% error is acceptable -- same query shape."""
    return (
        events.groupBy(F.col("event_type").alias("symbol"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("symbol")
    )

def cube_totals(events: DataFrame) -> DataFrame:
    """CUBE (symbol, day): all four grouping sets -- detail, per-symbol,
    per-day, grand total -- in one pass.  Complements ROLLUP
    (daily_rollup_totals), which only produces the hierarchical prefix
    sets; a BI layer slicing by either dimension independently needs the
    full cube.

    Scale: Spark expands each input row into the 4 grouping-set shapes
    *before* the exchange, but partial aggregation still collapses them
    map-side, so the shuffle carries |sets| x |distinct keys| rows, not
    4 x |input|."""
    day = F.date_trunc("day", F.col("ts"))
    return (
        events.cube(F.col("event_type").alias("symbol"), day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            qround(F.sum("value"), 2).alias("total_value"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(F.col("gid"), F.col("symbol"), F.col("day"))
    )

def grouping_sets_activity(events: DataFrame) -> DataFrame:
    """GROUPING SETS ((symbol), (user_id)): per-type totals and per-user
    totals in ONE scan + one shuffle, where naive code would union two
    separate groupBy jobs (two scans of a 100 TB table)."""
    # rename BEFORE grouping: groupingSets matches set members to grouping
    # columns by expression, so an alias inside the call would register as
    # a third, distinct grouping column.
    ev = events.withColumnRenamed("event_type", "symbol")
    return (
        ev.groupingSets([[F.col("symbol")], [F.col("user_id")]], "symbol", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            qround(F.sum("value"), 2).alias("total_value"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "symbol", "user_id")
    )

def event_type_unpivot(events: DataFrame) -> DataFrame:
    """UNPIVOT (melt): the pivoted per-user type counts turned back into
    long form -- (user_id, event_type, n_events) including explicit
    zeros.  Pivot and unpivot are each other's inverses up to those zero
    rows, which is exactly what the oracle's dense user x type grid
    checks.

    Scale: unpivot is a per-row expand (no shuffle); the only exchange
    belongs to the upstream pivot aggregate."""
    wide = event_type_pivot(events)
    return (
        wide.unpivot("user_id", EVENT_TYPES, "event_type", "n_events")
        .orderBy("user_id", "event_type")
    )

def distinct_user_counts_approx(events: DataFrame) -> DataFrame:
    """The 100 TB sketch path for ``distinct_user_counts``:
    ``approx_count_distinct`` (HyperLogLog++, rsd 2%) -- a mergeable
    sketch, one pass, no two-phase distinct expand.

    Oracle-checkable audit form (the KMV template): the HLL estimate
    itself is engine-internal, so the query emits the EXACT count (which
    the DuckDB oracle recomputes bit-identically) plus a
    ``approx_within_bound`` certificate asserting the sketch landed
    within 10% (5x the configured rsd; HLL's sparse mode is exact below
    a few thousand so small groups get an absolute floor of 5).  The
    sketch still runs -- it is folded into the boolean -- while every
    output column is deterministically recomputable.  pytest separately
    asserts the raw estimate tolerance."""
    exact = F.count_distinct("user_id")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    bound = F.greatest(0.10 * exact.cast("double"), F.lit(5.0))
    return (
        events.groupBy(F.col("event_type").alias("symbol"))
        .agg(
            exact.alias("n_users_exact"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.abs(approx.cast("double") - exact.cast("double")) <= bound
            ).alias("approx_within_bound"),
        )
        .orderBy("symbol")
    )

def value_percentiles_approx(events: DataFrame) -> DataFrame:
    """The 100 TB sketch path for ``value_percentiles``:
    ``percentile_approx`` (GK-style mergeable quantile sketch,
    accuracy 10000) -- one pass, no per-group full sort.

    Oracle-checkable audit form (the KMV template): sketch output is
    engine-internal, so the query emits the EXACT interpolated
    percentiles (DuckDB ``quantile_cont`` recomputes them
    bit-identically) plus an ``approx_within_bound`` certificate: each
    sketch quantile must fall between the exact quantiles at
    p +/- 0.005 (the sketch guarantees rank error 1/accuracy; 0.005
    gives 50x headroom while still being a real rank-error assertion).
    The sketch runs and is folded into the boolean; every output column
    is deterministically recomputable.  pytest separately asserts the
    raw estimates."""
    approx = F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
    lo = F.percentile("value", F.array(F.lit(0.495), F.lit(0.895), F.lit(0.985)))
    hi = F.percentile("value", F.array(F.lit(0.505), F.lit(0.905), F.lit(0.995)))
    exact = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    # NB: [] is 0-based in Spark SQL (element_at is the 1-based form)
    in_band = F.expr(
        "forall(sequence(0, 2), i -> ap[i] >= plo[i] AND ap[i] <= phi[i])"
    )
    agg = (
        events.groupBy(F.col("event_type").alias("symbol"))
        .agg(
            approx.alias("ap"),
            lo.alias("plo"),
            hi.alias("phi"),
            exact.alias("pe"),
        )
    )
    return agg.select(
        "symbol",
        qround(F.element_at("pe", 1), 6).alias("p50"),
        qround(F.element_at("pe", 2), 6).alias("p90"),
        qround(F.element_at("pe", 3), 6).alias("p99"),
        in_band.alias("approx_within_bound"),
    ).orderBy("symbol")


def hourly_from_minute(events: DataFrame) -> DataFrame:
    """Continuous-aggregate cascade: hourly OHLC bars re-aggregated from
    the minute-level partials of ``minute_ohlc`` -- the hypertable /
    materialized-rollup pattern where coarser grains are computed from
    the next-finer aggregate instead of re-scanning raw events.

    Every hourly stat is algebraically decomposable over the minute
    partials: high = max(minute highs), low = min(lows), totals and
    counts sum, and open/close chain through min_by/max_by on the minute
    start (the hour's open is the open of its first minute -- minute
    bars are already (ts, event_id)-ordered internally).
    ``tests/test_round3_ops.py`` asserts the cascade equals the direct
    hourly aggregation from raw events on the decomposable columns.

    Scale: THE reason this shape exists at 100 TB -- the hourly refresh
    reads |minutes| rows (already thousands-fold smaller than raw
    events) instead of the raw table; with minute partials persisted
    (e.g. the versioned gold table), each refresh is incremental.  Both
    aggregations are partial-agg friendly; the second groupBy reuses the
    symbol hash partitioning from the first (AQE coalesces the tiny
    exchange)."""
    minutes = minute_bars_unsorted(events)
    hour = F.date_trunc("hour", F.col("minute_window"))
    return (
        minutes.groupBy(
            "symbol", hour.alias("hour_window")
        )
        .agg(
            F.min_by("open_price", F.col("minute_window")).alias("open_price"),
            F.max("high_price").alias("high_price"),
            F.min("low_price").alias("low_price"),
            F.max_by("close_price", F.col("minute_window")).alias("close_price"),
            qround(F.sum("total_value"), 6).alias("total_value"),
            F.sum("n_trades").alias("n_trades"),
            F.count(F.lit(1)).alias("n_minutes"),
        )
        .orderBy("hour_window", "symbol")
    )

def hourly_symbol_stats(events: DataFrame) -> DataFrame:
    """Shared per-(symbol, hour-of-day) mean/stddev frame: the seasonal
    statistical baseline consumed by both the batch profile
    (``seasonal_baseline``) and the streaming anomaly scorer
    (``streaming.stateful.streaming_seasonal_anomaly_roundtrip``) -- one
    definition so the two can never drift from the shared oracle."""
    return events.groupBy(
        F.col("event_type").alias("symbol"),
        F.hour("ts").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("value").alias("mean_v"),
        F.stddev_pop("value").alias("std_v"),
    )

def seasonal_baseline(events: DataFrame) -> DataFrame:
    """Hour-of-day seasonal baseline per symbol: mean/stddev of the
    price and event count for each (symbol, hour-of-day), plus the
    hour's mean as a ratio of the symbol's overall mean -- the profile
    an anomaly detector subtracts before alerting (a quiet-hour spike is
    news; the same level at the daily peak is Tuesday).

    Scale: one partial-agg groupBy at (symbol x 24) cardinality plus a
    symbol-level roll of the same partials; the ratio join broadcasts
    the per-symbol scalars.  Nothing here is data-sized after the first
    aggregate."""
    hourly = hourly_symbol_stats(events).withColumnRenamed(
        "mean_v", "mean_raw"
    ).withColumnRenamed("std_v", "std_raw")
    overall = events.groupBy(F.col("event_type").alias("symbol")).agg(
        F.avg("value").alias("symbol_mean")
    )
    return (
        hourly.join(F.broadcast(overall), "symbol")
        .select(
            "symbol",
            "hour_of_day",
            "n_events",
            qround(F.col("mean_raw"), 6).alias("mean_value"),
            qround(F.col("std_raw"), 6).alias("std_value"),
            F.when(
                F.col("symbol_mean") != 0,
                qround(F.col("mean_raw") / F.col("symbol_mean"), 6),
            ).alias("vs_symbol_mean"),
        )
        .orderBy("symbol", "hour_of_day")
    )


def revenue_gini(orders: DataFrame) -> DataFrame:
    """Revenue-concentration report over customers: the Gini coefficient
    of per-customer order revenue (rank-sum form,
    G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x)) over the
    ascending-sorted series) plus the share held by the top decile --
    the Pareto readout behind every key-account analysis.

    Scale: one partial-agg groupBy to customer cardinality, ONE global
    sort for the rank (rank-sum needs a total order; at 100 TB the same
    formula runs on range-partitioned rank offsets), then a single-row
    aggregate."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("x")
    )
    w = Window.orderBy("x", "o_custkey")
    ranked = per_cust.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    k = F.floor(F.lit(0.1) * F.col("n"))
    return ranked.agg(
        F.max("n").alias("n_customers"),
        qround(F.sum("x"), 2).alias("total_revenue"),
        qround(
            (F.lit(2.0) * F.sum(F.col("i") * F.col("x"))
             - (F.max("n") + 1) * F.sum("x"))
            / (F.max("n") * F.sum("x")),
            6,
        ).alias("gini"),
        qround(
            F.sum(F.when(F.col("i") > F.col("n") - k, F.col("x"))) / F.sum("x"),
            6,
        ).alias("top_decile_share"),
    )


def cohort_ltv(orders: DataFrame) -> DataFrame:
    """Customer-lifetime-value curve by acquisition cohort: customers
    cohorted by first-order year, revenue accumulated by years since
    acquisition, normalized per cohort member -- the LTV triangle a
    finance team projects payback from (the orders-side complement of
    the events-side retention_cohorts).

    Scale: first-order year is one partial-agg rollup at customer
    cardinality, joined back to orders on the customer key; the curve
    itself lives at |cohort x offset| cardinality with one cumulative
    window."""
    first = orders.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).alias("cohort_year")
    )
    sized = first.groupBy("cohort_year").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    placed = orders.join(first, "o_custkey").select(
        "cohort_year",
        (F.year("o_orderdate") - F.col("cohort_year")).alias("year_offset"),
        "o_totalprice",
    )
    curve = placed.groupBy("cohort_year", "year_offset").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("rev_raw"),
    )
    wc = Window.partitionBy("cohort_year").orderBy("year_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        curve.join(F.broadcast(sized), "cohort_year")
        .select(
            "cohort_year",
            "year_offset",
            "n_customers",
            "n_orders",
            qround(F.col("rev_raw"), 2).alias("revenue"),
            qround(
                F.sum("rev_raw").over(wc) / F.col("n_customers"), 2
            ).alias("cum_ltv_per_customer"),
        )
        .orderBy("cohort_year", "year_offset")
    )


def mode_per_user(events):
    """Exact per-user MODE of the categorical event_type with a
    deterministic tie-break (count desc, then type asc) plus the mode's
    share of the user's events -- the per-entity dominant-category
    rollup (SQL has no mode() aggregate with pinned ties; this is the
    two-stage groupBy + rank idiom).

    Scale: one partial-aggregable (user, type) groupBy collapses to at
    most |types| rows per user BEFORE the window, so the rank sort runs
    at category cardinality per user -- never over raw events; the
    share window reuses the same user_id exchange."""
    from pyspark.sql import functions as F

    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return mode_from_counts(counts)


def mode_from_counts(counts):
    """Mode rollup from a (user_id, event_type, n) count frame -- shared
    by the batch operator and the streaming twin (whose counts come from
    merged micro-batch partials; integer-count addition commutes with
    batching, so both paths feed bit-identical frames here and share one
    oracle).  Rank by count desc then type asc; runs at category
    cardinality per user."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.numeric import qround

    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    total = F.sum("n").over(Window.partitionBy("user_id"))
    ranked = counts.select(
        "user_id",
        "event_type",
        "n",
        total.alias("n_total"),
        F.row_number().over(w).alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("n").alias("n_mode"),
            "n_total",
            qround(
                F.col("n").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("mode_share"),
        )
        .orderBy("user_id")
    )
