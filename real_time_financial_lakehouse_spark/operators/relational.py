"""Batch relational core: projections, filters, casts, scalar expressions.

Covers SURVEY section-2.2 (P1-P14): the reference's JSON parse + struct
star-expansion (consumer_lake.py:44), casts (process_silver.py:47),
conjunctive filters (train_model.py:30), null fill (process_silver.py:67),
literals (process_silver.py:78), arithmetic / conditional / interval /
epoch-millis expressions (dashboard.py:17-22,43,47,92; producer.py:20).

Everything here is built-in ``pyspark.sql.functions`` column expressions --
JVM-side, whole-stage-codegen'd, no Python boundary.  At 100 TB these are
the cheapest operators in the engine *if* they stay next to the scan so
Catalyst pushes comparisons into the parquet reader; each builder therefore
takes and returns DataFrames without forcing any action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import qround

from ..schemas import PROPS_SCHEMA

def parse_props(events: DataFrame) -> DataFrame:
    """P1+P2: ``from_json`` against an explicit schema, then struct
    star-expansion -- the reference's Kafka-value parse
    (consumer_lake.py:44) applied to the ``events.props`` JSON column."""
    return events.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.from_json(F.col("props"), PROPS_SCHEMA).alias("data"),
    ).select("event_id", "ts", "event_type", "value", "data.*")

def bronze_normalize(events: DataFrame) -> DataFrame:
    """P3/P4/P12/P14: the bronze normalization projection.  Mirrors the
    producer/consumer reshape (producer.py:16-21, process_silver.py:47):
    string casts, epoch-millis round trip, ISO formatting, rounding."""
    return events.select(
        F.col("event_id"),
        F.col("event_type").alias("symbol"),
        F.col("value").cast("double").alias("price"),
        qround(F.col("value") * 2.5, 2).alias("notional"),
        F.unix_millis(F.col("ts")).alias("epoch_ms"),
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss").alias("iso_ts"),
        F.col("ts").cast("string").alias("ts_str"),
    )

def positive_filter(df: DataFrame, price_col: str = "average_price", vol_col: str = "volatility") -> DataFrame:
    """P5: the training-data guard filter (train_model.py:30):
    ``(average_price > 0) AND (volatility >= 0)``."""
    return df.filter((F.col(price_col) > 0) & (F.col(vol_col) >= 0))

def fill_and_flag(events: DataFrame) -> DataFrame:
    """P7/P8/P10: null-fill (process_silver.py:67 ``na.fill``), literal
    column (process_silver.py:78 ``lit(0.0)``), and conditional
    gain/loss split (dashboard.py:19-20 ``where(delta > 0, 0)``)."""
    return events.select(
        "event_id",
        "event_type",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.lit(0.0).alias("predicted_price"),
        F.when(F.col("value") > 100.0, F.col("value")).otherwise(F.lit(0.0)).alias("gain"),
        F.when(F.col("value") <= 100.0, -F.col("value")).otherwise(F.lit(0.0)).alias("loss"),
    )

def shift_timezone(events: DataFrame, hours: int = 3) -> DataFrame:
    """P11: timestamp shift by a literal interval -- the dashboard's
    UTC->TRT display shift (dashboard.py:43)."""
    return events.select(
        "event_id",
        F.col("ts").alias("ts_utc"),
        (F.col("ts") + F.expr(f"INTERVAL {hours} HOURS")).alias("ts_local"),
        F.date_trunc("minute", F.col("ts") + F.expr(f"INTERVAL {hours} HOURS")).alias("minute_local"),
    )

def format_and_time(events: DataFrame) -> DataFrame:
    """P12/P14 + strftime: epoch-millis round trip
    (``timestamp_millis(unix_millis(ts))``, the producer.py:20 conversion
    run both directions), wall-clock formatting (dashboard.py:109
    ``'%H:%M:%S'``), and numeric display formatting (dashboard.py:96-102
    ``:,.2f`` metric tiles) -- including thousands grouping on a bigint."""
    from ..functions.numeric import qround

    # price_fmt is SEPARATOR-FREE ('%.2f' over a half-up-quantized value):
    # Spark's format_number would insert thousands separators ('1,234.50')
    # that DuckDB's printf lacks and DuckDB's fmt cannot produce for
    # floats, so the two engines would disagree for any value >= 1000.
    # The reference's ':,.2f' grouping surface is covered by big_fmt
    # (bigint grouping, where both engines agree).  Quantizing before
    # formatting keeps '%.2f' away from exact .xx5 midpoints, where Java
    # (half-up) and C (half-even) printf would round apart.
    return events.select(
        "event_id",
        F.timestamp_millis(F.unix_millis(F.col("ts"))).alias("ts_ms"),
        F.date_format(F.col("ts"), "HH:mm:ss").alias("hms"),
        F.format_string("%.2f", qround(F.col("value"), 2)).alias("price_fmt"),
        F.format_number((F.col("user_id") * F.lit(1_000_000)).cast("long"), 0).alias("big_fmt"),
    )

def json_roundtrip(events: DataFrame) -> DataFrame:
    """``to_json`` (producer.py:11 serialization) composed with
    ``get_json_object`` extraction, so the check is independent of either
    engine's JSON whitespace/key-order conventions."""
    j = F.to_json(F.struct(F.col("event_type").alias("symbol"), F.col("value").alias("price")))
    return events.select(
        "event_id",
        F.get_json_object(j, "$.symbol").alias("symbol_rt"),
        F.get_json_object(j, "$.price").cast("double").alias("price_rt"),
    )

def gain_loss_split(delta: Column) -> tuple[Column, Column]:
    """The RSI gain/loss conditional (dashboard.py:19-20) as reusable
    column expressions."""
    gain = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    loss = F.when(delta < 0, -delta).otherwise(F.lit(0.0))
    return gain, loss

def merge_upsert(events: DataFrame) -> DataFrame:
    """MERGE INTO semantics (lakehouse upsert) expressed as a FULL OUTER
    join: a deterministic updates batch (corrections doubling every 10th
    event's value, plus brand-new rows minted from every 97th event id)
    merged into the snapshot -- matched rows take the update, unmatched
    updates insert, everything else is kept unchanged, with a ``action``
    audit column.

    Scale: this is exactly what Delta/Iceberg MERGE compiles to -- a
    shuffle join of snapshot and updates on the merge key, rewriting
    matched files.  At 100 TB the wins come from (1) partition pruning:
    restrict the snapshot side to partitions the updates can touch
    (join the updates' distinct partition keys first), and (2) a
    broadcast of the updates when the batch is small -- Catalyst picks
    that automatically here since the updates derive from a filtered
    scan.  Delta-the-format adds a transaction log on top; the join
    itself is identical."""
    snapshot = events.select("event_id", "user_id", "event_type", "value")
    corrections = snapshot.filter(F.col("event_id") % 10 == 0).withColumn(
        "value", F.col("value") * 2.0
    )
    inserts = snapshot.filter(F.col("event_id") % 97 == 0).select(
        (F.col("event_id") + 10_000_000).alias("event_id"),
        "user_id",
        F.lit("backfill").alias("event_type"),
        "value",
    )
    updates = corrections.unionByName(inserts)
    s, u = snapshot.alias("s"), updates.alias("u")
    merged = s.join(u, F.col("s.event_id") == F.col("u.event_id"), "full_outer").select(
        F.coalesce(F.col("u.event_id"), F.col("s.event_id")).alias("event_id"),
        F.coalesce(F.col("u.user_id"), F.col("s.user_id")).alias("user_id"),
        F.coalesce(F.col("u.event_type"), F.col("s.event_type")).alias("event_type"),
        F.coalesce(F.col("u.value"), F.col("s.value")).alias("value"),
        F.when(F.col("s.event_id").isNull(), F.lit("inserted"))
        .when(F.col("u.event_id").isNull(), F.lit("kept"))
        .otherwise(F.lit("updated"))
        .alias("action"),
    )
    return merged.orderBy("event_id")


def funnel_counts(
    events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered event-sequence funnel: per stage, how many users performed
    stage k strictly AFTER their first occurrence of stage k-1 -- the
    Amplitude/Mixpanel-style conversion query an events gold layer
    serves (each user counts once per stage, anchored at their earliest
    qualifying time; order matters, a purchase before the first view
    does not convert).

    Scale: one user-keyed groupBy per stage over a stage-filtered scan
    (filter pushes to parquet; partial agg map-side), chained by
    user-keyed equi-joins -- every shuffle is on the same key, so AQE
    reuses the partitioning down the chain, and each stage's frame
    shrinks monotonically (funnels only narrow).  The final counts are
    three scalar aggregates unioned driver-free; conversion ratios are
    NULL-guarded for empty stages."""
    per_stage = []
    anchored = None
    for stage in stages:
        hits = events.filter(F.col("event_type") == stage).select("user_id", "ts")
        if anchored is None:
            anchored = hits.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            anchored = (
                hits.join(anchored.select("user_id", F.col("t").alias("t_prev")), "user_id")
                .filter(F.col("ts") > F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        per_stage.append(
            anchored.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit(len(per_stage) + 1).cast("long").alias("stage"),
                F.lit(stage).alias("event_type"),
                "n_users",
            )
        )
    out = per_stage[0]
    for frame in per_stage[1:]:
        out = out.unionByName(frame)
    w = Window.orderBy("stage")
    prev = F.lag("n_users").over(w)
    return out.select(
        "stage",
        "event_type",
        "n_users",
        F.when(
            prev > 0,
            F.floor(F.col("n_users") / prev * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6),
        ).alias("conversion"),
    ).orderBy("stage")


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Retention-cohort triangle: users grouped by first-activity day,
    counted on each subsequent active day as an offset from the cohort
    day, with the share of the cohort still active -- the companion to
    ``funnel_counts`` in any product-analytics gold layer.

    Scale: one groupBy(user) for the cohort anchor, one distinct over
    (user, day) -- both partial-aggregable shuffles on the user -- then a
    user-keyed equi-join (the anchor frame is one row per user; AQE
    broadcasts it when small, SMJ beyond) and a final
    (cohort, offset)-keyed aggregate at triangle cardinality
    (days^2 / 2 rows, tiny).  The cohort-size join for the retention
    denominator reuses the offset-0 row -- no second scan of events."""
    first = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    cells = (
        active.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    size = cells.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_users").alias("cohort_size")
    )
    return (
        cells.join(size, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_users",
            "cohort_size",
            F.when(
                F.col("cohort_size") > 0,
                F.floor(
                    F.col("n_users") / F.col("cohort_size") * F.lit(1e6) + F.lit(0.5)
                )
                / F.lit(1e6),
            ).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


def debounce_events(events: DataFrame, min_gap_s: int = 5) -> DataFrame:
    """Telemetry debounce: within each (user_id, event_type) stream, drop
    an event that fires less than ``min_gap_s`` seconds after the
    previous KEPT... in the standard lag-based approximation, after the
    previous event (double-click suppression, retry-storm collapse --
    the cheap cleanup pass every event pipeline runs before
    sessionization).  First event per key always survives.

    Scale: one window over (user_id, event_type) ordered by time -- a
    single hash-partitioned exchange on a high-cardinality composite
    key, no self-join; the lag frame is one row, so state per task is
    O(1) rows.  The lag-vs-previous-event form (not previous-KEPT) is
    deliberate: it is expressible as one window pass on both engines;
    the kept-anchored variant needs a session-style running state
    (sessionize_users' gaps-and-islands shape) and is documented there."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_ok = prev.isNull() | (
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > min_gap_s * 1_000_000
    )
    return (
        events.withColumn("__keep", gap_ok)
        .filter(F.col("__keep"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


def _rfm_base(orders: DataFrame) -> DataFrame:
    """Shared per-customer RFM frame: one partial-agg groupBy to customer
    cardinality + a broadcast 1-row reference date; recency in days,
    order count, spend quantized at 2 dp (the cross-engine hand-off)."""
    from ..functions.numeric import qround

    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    )
    ref = per_cust.agg(F.max("last_order").alias("ref_date"))
    return per_cust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff(F.col("ref_date"), F.col("last_order")).alias("recency_days"),
        "frequency",
        qround(F.col("monetary"), 2).alias("monetary"),
    )


def customer_rfm(orders: DataFrame, n_tiles: int = 4) -> DataFrame:
    """RFM customer segmentation over the orders table: recency (days
    since the customer's last order, against the corpus max date),
    frequency (order count), monetary (total spend), each quartiled with
    NTILE and concatenated into the classic 'RFM cell' label -- the
    segmentation every CRM/lifecycle pipeline starts from.

    Determinism: every NTILE orders by (metric, o_custkey) so tied
    customers land in the same tile in both engines.  Scale: one
    partial-agg groupBy to customer cardinality; the three NTILEs are
    single-partition windows over that aggregated frame -- at true 100 TB
    customer counts swap them for percent_rank (range-partition
    friendly) or approx-quantile cut points; the orders scan itself
    never sorts."""
    from pyspark.sql import Window as W

    base = _rfm_base(orders)
    r_w = W.orderBy(F.col("recency_days").asc(), F.col("o_custkey"))
    f_w = W.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
    m_w = W.orderBy(F.col("monetary").desc(), F.col("o_custkey"))
    return (
        base.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            F.ntile(n_tiles).over(r_w).alias("r_tile"),
            F.ntile(n_tiles).over(f_w).alias("f_tile"),
            F.ntile(n_tiles).over(m_w).alias("m_tile"),
        )
        .withColumn(
            "rfm_cell",
            F.concat_ws("", F.col("r_tile"), F.col("f_tile"), F.col("m_tile")),
        )
        .orderBy("o_custkey")
    )


def customer_rfm_approx(orders: DataFrame) -> DataFrame:
    """The documented 100 TB swap for ``customer_rfm``, now a checked
    query (the volatility_cones_approx certificate template): quartile
    CUT POINTS from ``percentile_approx`` (GK mergeable sketch, accuracy
    10000 -- one partial-aggregable pass) instead of the exact NTILE's
    single-partition windows over the customer frame.  Oracle-checkable
    audit form: per metric (recency/frequency/monetary) the emitted cut
    points are the EXACT quartiles (DuckDB ``quantile_cont`` twin)
    quantized at 6 dp, customers are bucketed by comparing their metric
    against the 3 broadcast cuts (1 + #cuts_below, deterministic on
    quantized values), and the sketch folds into an
    ``approx_within_band`` certificate -- every approx quartile must
    land between the exact quantiles at p +/- 0.01.

    Scale: customer-cardinality groupBy + ONE percentile aggregation +
    one broadcast of 9 doubles back against the customer frame; no
    global sort, no single-partition window anywhere -- the shape that
    survives a 10^9-customer table."""
    base = _rfm_base(orders)

    def pe(c: str) -> F.Column:
        return F.expr(
            f"percentile({c}, array(0.24D, 0.25D, 0.26D, 0.49D, 0.5D,"
            " 0.51D, 0.74D, 0.75D, 0.76D))"
        )

    cuts = base.agg(
        pe("recency_days").alias("pe_r"),
        F.percentile_approx("recency_days", [0.25, 0.5, 0.75], 10000).alias("ap_r"),
        pe("frequency").alias("pe_f"),
        F.percentile_approx("frequency", [0.25, 0.5, 0.75], 10000).alias("ap_f"),
        pe("monetary").alias("pe_m"),
        F.percentile_approx("monetary", [0.25, 0.5, 0.75], 10000).alias("ap_m"),
    )
    q3 = (
        "transform(sequence(0, 2), i -> cast("
        "floor(element_at({p}, i * 3 + 2) * 1000000.0 + 0.5) / 1000000.0"
        " as double))"
    )
    wb = (
        "forall(sequence(0, 2), i ->"
        " cast(element_at({a}, i + 1) as double) >= element_at({p}, i * 3 + 1)"
        " AND cast(element_at({a}, i + 1) as double)"
        " <= element_at({p}, i * 3 + 3))"
    )
    sel = cuts.select(
        F.expr(q3.format(p="pe_r")).alias("cr"),
        F.expr(wb.format(a="ap_r", p="pe_r")).alias("wr"),
        F.expr(q3.format(p="pe_f")).alias("cf"),
        F.expr(wb.format(a="ap_f", p="pe_f")).alias("wf"),
        F.expr(q3.format(p="pe_m")).alias("cm"),
        F.expr(wb.format(a="ap_m", p="pe_m")).alias("wm"),
    )
    stacked = (
        base.crossJoin(F.broadcast(sel))
        .select(
            F.explode(
                F.expr(
                    "array(struct('frequency' AS metric,"
                    " cast(frequency as double) AS v, cf AS cuts, wf AS wb),"
                    " struct('monetary' AS metric,"
                    " cast(monetary as double) AS v, cm AS cuts, wm AS wb),"
                    " struct('recency' AS metric,"
                    " cast(recency_days as double) AS v, cr AS cuts, wr AS wb))"
                )
            ).alias("s")
        )
        .select("s.*")
    )
    tile = F.lit(1) + F.expr(
        "aggregate(cuts, 0, (acc, c) -> acc + (CASE WHEN v > c THEN 1 ELSE 0 END))"
    )
    return (
        stacked.withColumn("tile", tile)
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min(F.expr("cuts[0]")).alias("c25"),
            F.min(F.expr("cuts[1]")).alias("c50"),
            F.min(F.expr("cuts[2]")).alias("c75"),
            F.sum(F.when(F.col("tile") == 1, 1).otherwise(0)).alias("n_t1"),
            F.sum(F.when(F.col("tile") == 2, 1).otherwise(0)).alias("n_t2"),
            F.sum(F.when(F.col("tile") == 3, 1).otherwise(0)).alias("n_t3"),
            F.sum(F.when(F.col("tile") == 4, 1).otherwise(0)).alias("n_t4"),
            F.expr("bool_and(wb)").alias("approx_within_band"),
        )
        .orderBy("metric")
    )


def funnel_time_to_convert(events: DataFrame) -> DataFrame:
    """Conversion-latency summary for the view -> purchase funnel: per
    user, the time from the FIRST view to the FIRST purchase at or
    after it; reported as one summary row -- viewers, converters,
    conversion rate, and the median / p90 / max latency in minutes.
    The product-analytics complement of funnel_counts (which counts
    stages; this measures how long conversion takes).

    Scale: two partial-aggregable per-user min-timestamp rollups and a
    user-cardinality join; the latency distribution aggregates straight
    to one row, so nothing beyond the first shuffle is data-sized."""
    views = events.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("t_p")
    )
    conv = (
        views.join(purchases, "user_id")
        .filter(F.col("t_p") >= F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("t_p").alias("t_purchase"))
        .select(
            "user_id",
            (
                (F.unix_micros("t_purchase") - F.unix_micros("t_view"))
                / F.lit(60_000_000.0)
            ).alias("latency_min"),
        )
    )
    n_viewers = views.agg(F.count(F.lit(1)).alias("n_viewers"))
    return (
        conv.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.expr("percentile(latency_min, 0.5)").alias("med_raw"),
            F.expr("percentile(latency_min, 0.9)").alias("p90_raw"),
            F.max("latency_min").alias("max_raw"),
        )
        .crossJoin(F.broadcast(n_viewers))
        .select(
            "n_viewers",
            "n_converted",
            # ANSI-safe: zero viewers reports NULL rate, not DIVIDE_BY_ZERO
            F.when(
                F.col("n_viewers") > 0,
                qround(F.col("n_converted") / F.col("n_viewers"), 6),
            ).alias("conversion_rate"),
            qround(F.col("med_raw"), 4).alias("median_minutes"),
            qround(F.col("p90_raw"), 4).alias("p90_minutes"),
            qround(F.col("max_raw"), 4).alias("max_minutes"),
        )
    )


def window_funnel_stages(
    events: DataFrame, timeout_hours: int = 6
) -> DataFrame:
    """Strict-order window funnel (the ClickHouse ``windowFunnel``
    shape): per user, how far the view -> click -> purchase chain gets
    when every later stage must happen STRICTLY AFTER the previous one
    and INSIDE a fixed window anchored at the first view -- reported as
    the max-stage histogram with each cohort's share of entrants.
    Complements ``funnel_counts`` (unordered stage reach) and
    ``funnel_time_to_convert`` (2-stage latency): this is the ordered,
    timeout-bounded sequence-match those two don't express.

    Semantics pinned for the oracle: stage 1 = first 'view'; stage 2 =
    earliest 'click' with t1 < t <= t1 + timeout; stage 3 = earliest
    'purchase' with t2 < t <= t1 + timeout (window anchored at t1, the
    ClickHouse convention, NOT re-anchored per step).

    Scale: ONE hash exchange on user_id serves the whole chain -- the
    three stage timestamps are conditional whole-partition window
    minima layered over the SAME partitioning (t2's predicate reads t1,
    t3's reads both, so they stack as three Window ops with zero extra
    shuffles), and the per-user collapse reuses that partitioning too;
    the histogram is <= 3 rows and the entrant share joins a broadcast
    1-row total.  The naive formulation (three filtered aggregates
    chained by joins) re-expands the anchor subtree into every
    consumer -- 14 scans at plan time; this shape scans events once."""
    wu = Window.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(wu)
    step1 = events.select("user_id", "event_type", "ts", t1.alias("t1"))
    deadline = F.col("t1") + F.expr(f"INTERVAL {timeout_hours} HOURS")
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= deadline),
            F.col("ts"),
        )
    ).over(wu)
    step2 = step1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= deadline),
            F.col("ts"),
        )
    ).over(wu)
    step3 = step2.withColumn("t3", t3).filter(F.col("t1").isNotNull())
    per_user = step3.groupBy("user_id").agg(
        F.max(
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
            ).cast("long")
        ).alias("max_stage")
    )
    hist = per_user.groupBy("max_stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    total = hist.agg(F.sum("n_users").alias("total"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            "max_stage",
            "n_users",
            qround(
                F.col("n_users").cast("double") / F.col("total").cast("double"), 6
            ).alias("pct_of_entrants"),
        )
        .orderBy("max_stage")
    )
