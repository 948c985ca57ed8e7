"""Table profiling: per-column data-quality statistics in one pass.

The first thing a lakehouse operator runs against a new 100 TB source is
a profile -- null rates, cardinalities, value ranges -- to decide
partitioning, z-order keys, and quality gates.  This operator computes it
as ONE aggregation over ONE scan (no per-column jobs, no driver loops),
then unpivots the single result row into a per-column report with
``stack``.

Scale notes: multiple exact ``countDistinct`` aggregates make Catalyst
plan an Expand (one duplicated stream per distinct aggregate) -- correct
but a multiplier on shuffle volume.  ``approx=True`` swaps them for
HyperLogLog++ ``approx_count_distinct``, which collapses the plan back to
a single partial-aggregated pass: that is the 100 TB default, exact is
the oracle-checkable twin (same trade as distinct_user_counts vs
distinct_user_counts_approx).  Min/max surface as strings so one report
schema covers numeric, string, and timestamp columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column profile.  NOTE on the exact path's input contract
    (round-13 advisor): the per-column branches below re-evaluate ``df``
    once per profiled column, which is strictly cheaper than the single
    Expand pass ONLY when ``df`` is a direct columnar scan (each branch
    then reads one column's pages).  For a derived / post-shuffle input,
    lineage-cut first (``df.localCheckpoint(eager=True)``) or pass
    ``approx=True`` (single pass); the registered ``profile_events``
    query feeds a plain parquet scan, where the branch form is the
    100 TB-correct shape."""
    cols = columns or df.columns
    if approx:
        # HLL++ keeps the whole profile ONE partial-aggregated pass --
        # the 100 TB default (no Expand: approx_count_distinct is a
        # plain aggregate, not a distinct rewrite).
        aggs = [F.count(F.lit(1)).alias("__n_rows")]
        for c in cols:
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
                F.approx_count_distinct(c).alias(f"{c}__distinct"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
        one = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
        )
        return (
            one.select(
                F.col("__n_rows").alias("n_rows"),
                F.expr(
                    f"stack({len(cols)}, {stack_args})"
                    " AS (column_name, n_nulls, n_distinct, min_value, max_value)"
                ),
            )
            .select(
                "column_name", "n_rows", "n_nulls", "n_distinct",
                "min_value", "max_value",
            )
            .orderBy("column_name")
        )
    # Exact path (guide s2.3/s2.4): N exact countDistinct aggregates in
    # one agg made Catalyst plan an Expand (N+1 duplicated streams) and,
    # because the grouping key then contains every profiled column, a
    # pair of SORT aggregates keyed on all of them at once -- measured
    # as two full sorts of a 7x-expanded corpus carrying the long
    # document/props strings.  Per-column narrow branches are strictly
    # cheaper: each branch scans ONE parquet column (columnar pruning),
    # partial-aggregates to that column's distinct values, and folds
    # (n_rows, n_nulls, n_distinct, min, max) from the per-value counts
    # -- every output is an exact integer / typed min-max, so the report
    # is value-identical, and the union's branch stages schedule
    # concurrently.  At 100 TB the unioned branches read the same total
    # bytes as the single scan (one column each) with no Expand
    # multiplier and vocabulary-cardinality shuffles.
    branches = []
    for c in cols:
        per_val = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        branches.append(
            per_val.agg(
                F.sum("__cnt").alias("n_rows"),
                F.sum(
                    F.when(F.col("__v").isNull(), F.col("__cnt")).otherwise(
                        F.lit(0)
                    )
                ).alias("n_nulls"),
                F.count("__v").alias("n_distinct"),
                F.min("__v").cast("string").alias("min_value"),
                F.max("__v").cast("string").alias("max_value"),
            ).select(
                F.lit(c).alias("column_name"),
                F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
                F.coalesce(F.col("n_nulls"), F.lit(0)).alias("n_nulls"),
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("column_name")


def key_skew_profile(df: DataFrame, key: str, topn: int = 5) -> DataFrame:
    """Join-key skew diagnosis: per-key row counts reduced to the
    numbers that decide a shuffle strategy -- mean/max rows per key, the
    p99 key, the max/mean skew ratio, and the share of all rows held by
    the ``topn`` heaviest keys.  This is the query you run BEFORE
    picking salting factors or trusting AQE's skew-join splitting on a
    100 TB join: a skew_ratio near 1 means plain hash partitioning is
    fine; a top-key share of 30% means one task would own 30% of the
    shuffle.

    Scale: one partial-aggregated groupBy(key); everything after runs at
    KEY cardinality, not row cardinality (the percentile and the top-N
    sort see one row per key).  Output is a single summary row --
    nothing data-sized ever concentrates."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    top = (
        per_key.orderBy(F.col("n").desc(), F.col(key))
        .limit(topn)
        .agg(F.sum("n").alias("top_rows"))
    )
    summary = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_per_key"),
        F.expr("percentile(n, 0.99)").alias("p99_per_key"),
        F.avg("n").alias("mean_per_key"),
    )
    return (
        summary.crossJoin(F.broadcast(top))
        .select(
            F.lit(key).alias("key"),
            "n_keys",
            "n_rows",
            "max_per_key",
            (F.floor(F.col("p99_per_key") * 100.0 + F.lit(0.5)) / 100.0).alias(
                "p99_per_key"
            ),
            (
                F.floor(
                    F.col("max_per_key") / F.col("mean_per_key") * 10000.0 + F.lit(0.5)
                )
                / 10000.0
            ).alias("skew_ratio"),
            (
                F.floor(F.col("top_rows") / F.col("n_rows") * 10000.0 + F.lit(0.5))
                / 10000.0
            ).alias("top5_share"),
        )
    )


def kmv_distinct_estimate(
    documents: DataFrame, k: int = 32, group_col: str = "source"
) -> DataFrame:
    """K-Minimum-Values distinct-count sketch per group, audited against
    the exact count (Bar-Yossef et al. 2002, the KMV/bottom-k sketch):
    hash every normalized document into the 60-bit md5 space, keep each
    group's k smallest DISTINCT hashes, and estimate the group's
    distinct cardinality as ``(k-1) / (h_k / 2^60)`` -- if the k-th
    smallest of D uniform points sits at h_k, then D is about
    (k-1) * 2^60 / h_k.  Groups with fewer than k distinct hashes are
    exact by construction.  md5 is engine-stable, so unlike HLL
    (``distinct_user_counts_approx``, Spark-private sketch) the WHOLE
    sketch -- chosen hashes, estimate, and error -- is exactly
    oracle-checkable; the report shows estimate, exact, and relative
    error side by side, which is the audit you run before trusting a
    sketch config on a 100 TB corpus.

    Scale: dedup of (group, hash) partial-aggregates map-side; the
    bottom-k per group is a WindowGroupLimit-pushed rank (each task
    keeps <= k rows per group before the exchange), so the shuffle
    carries O(groups x k), never the corpus.  The exact-count audit
    column costs one more partial-agg pass; drop it in production and
    the sketch is one bounded shuffle."""
    from ..functions.hashing import md5_long, normalize_text
    from ..functions.numeric import qround

    from pyspark.sql import Window

    # coalesce NULL text to '' so the hash is never NULL -- a NULL key
    # would order differently across engines (Spark sorts NULLS FIRST,
    # DuckDB NULLS LAST) and break the bottom-k determinism
    hashed = documents.select(
        F.col(group_col).alias("grp"),
        md5_long(normalize_text(F.coalesce(F.col("text"), F.lit("")))).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    bottom = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    sketch = bottom.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
    )
    exact = hashed.groupBy("grp").agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(1152921504606846976.0) / F.col("h_k")
    )
    return (
        sketch.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_kept",
            qround(est, 4).alias("kmv_estimate"),
            "exact_distinct",
            qround(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_error"),
        )
        .orderBy(group_col)
    )


def mad_outliers(events: DataFrame, z_cut: float = 3.5) -> DataFrame:
    """Robust per-symbol outlier report via the median / MAD (median
    absolute deviation) rule: robust z = |v - median| / (1.4826 * MAD),
    flagging |z| > ``z_cut`` -- the estimator that survives the very
    outliers a mean/stddev z-score is corrupted by (one fat-fingered
    tick inflates stddev and hides itself).  1.4826 scales MAD to the
    stddev of a normal.  A zero-MAD symbol (>=50% identical values)
    reports NULL z columns rather than a division error.

    Scale: three partial-agg passes at symbol cardinality -- median,
    then MAD over the broadcast-joined deviations, then the z-scan with
    both scalars broadcast back.  Exact ``percentile`` is the
    correctness twin; at 100 TB swap both order statistics to the KLL
    sketch (``percentile_approx``) and the passes collapse to mergeable
    one-pass sketches, same report schema."""
    from ..functions.numeric import qround

    med = events.groupBy(F.col("event_type").alias("symbol")).agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    devs = events.select(F.col("event_type").alias("symbol"), "value").join(
        F.broadcast(med), "symbol"
    )
    mad = devs.groupBy("symbol").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    scored = devs.join(F.broadcast(mad), "symbol")
    # the mad != 0 guard must live INSIDE the per-row expression: ANSI
    # mode raises DIVIDE_BY_ZERO even for doubles, and aggregates under
    # a CASE still evaluate their input rows
    z = F.when(
        F.col("mad") != 0,
        F.abs(F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad")),
    )
    return (
        scored.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qround(F.first("med"), 6).alias("median_value"),
            qround(F.first("mad"), 6).alias("mad"),
            F.sum(F.when(z > z_cut, 1).otherwise(0)).alias("n_outliers"),
            qround(F.max(z), 6).alias("max_robust_z"),
        )
        .orderBy("symbol")
    )


def selfjoin_size_estimate(
    events: DataFrame, width: int = 256, depth: int = 3
) -> DataFrame:
    """Join-cardinality estimation via count-min/AMS sketch inner
    product: the size of ``events JOIN events ON user_id`` equals
    ``sum(cnt_u^2)`` (the stream's second frequency moment), and a CMS
    row estimates it as ``sum_j c[j]^2`` -- hash collisions only ADD,
    so each row overestimates and the minimum over ``depth`` rows is the
    sketch estimate (Alon-Matias-Szegedy / Cormode-Muthukrishnan).  This
    is the statistic a query planner needs to choose a join strategy
    BEFORE running the join; the report shows the estimate, the exact
    moment, and the relative error, per the audit-the-sketch convention
    (``minhash_jaccard_estimate``, ``kmv_distinct_estimate``).

    Scale: the CMS build is one partial-agg groupBy at (depth x width)
    cardinality -- counters merge across partitions, micro-batches, and
    days, so the estimate maintains incrementally while the exact
    ``sum(cnt^2)`` needs a full re-shuffle of the key column every time;
    that asymmetry is the whole point at 100 TB.  md5 positions keep the
    sketch engine-stable, so even the collision error is oracle-exact."""
    from ..functions.hashing import md5_long
    from ..functions.numeric import qround

    keyed = events.filter(F.col("user_id").isNotNull())
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    positions = keyed.select(F.col("user_id"), rows).select(
        "r",
        (md5_long(F.concat_ws(":", F.col("r"), F.col("user_id")), 7) % width).alias(
            "pos"
        ),
    )
    counters = positions.groupBy("r", "pos").agg(F.count(F.lit(1)).alias("c"))
    per_row = counters.groupBy("r").agg(F.sum(F.col("c") * F.col("c")).alias("f2_row"))
    est = per_row.agg(F.min("f2_row").alias("estimate"))
    exact = (
        keyed.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("exact_size"))
    )
    return (
        est.crossJoin(exact)
        .select(
            F.lit(width).alias("width"),
            F.lit(depth).alias("depth"),
            "estimate",
            "exact_size",
            qround(
                (F.col("estimate") - F.col("exact_size"))
                / F.col("exact_size").cast("double"),
                6,
            ).alias("rel_error"),
        )
    )


def event_gap_stats(events: DataFrame, outage_s: float = 300.0) -> DataFrame:
    """Feed-health diagnosis per symbol from inter-arrival gaps: mean /
    p95 / max seconds between consecutive events plus the count of gaps
    exceeding ``outage_s`` -- the first query an on-call runs when a
    market-data feed looks stale (a healthy feed has a tight gap
    distribution; outages show up as a fat max and a nonzero outage
    count long before a missing-data report does).

    Scale: one window pass (lag over symbol/time order -- O(1) state per
    task) and one partial-agg groupBy at symbol cardinality.  Exact
    ``percentile`` is the oracle twin; swap to the KLL sketch at 100 TB
    as usual."""
    from pyspark.sql import Window

    from ..functions.numeric import qround

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = events.select(
        F.col("event_type").alias("symbol"),
        (
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            )
            / F.lit(1_000_000.0)
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            qround(F.avg("gap_s"), 6).alias("mean_gap_s"),
            qround(F.expr("percentile(gap_s, 0.95)"), 6).alias("p95_gap_s"),
            qround(F.max("gap_s"), 6).alias("max_gap_s"),
            F.sum((F.col("gap_s") > outage_s).cast("long")).alias("n_outages"),
        )
        .orderBy("symbol")
    )


def anomaly_episodes(
    events: DataFrame, z_cut: float = 3.0, gap_s: float = 300.0
) -> DataFrame:
    """Alert-episode report: z-score anomalies (per-symbol mean/std,
    guarded for zero variance) grouped into EPISODES -- consecutive
    anomalous events less than ``gap_s`` apart -- with each episode's
    span, event count, and peak z.  This is the dedup an alerting
    pipeline needs: one fat-tailed burst is one page, not five hundred.

    Scale: the stats pass is one partial-agg groupBy broadcast back; the
    episode assignment is the gaps-and-islands idiom (lag + conditional
    cumsum) over ONLY the anomalous rows -- the window runs on the
    filtered minority, not the corpus -- and the final rollup aggregates
    at episode cardinality."""
    from pyspark.sql import Window

    from ..functions.numeric import qround

    stats = events.groupBy(F.col("event_type").alias("symbol")).agg(
        F.avg("value").alias("mean_v"), F.stddev_pop("value").alias("std_v")
    )
    scored = events.select(
        F.col("event_type").alias("symbol"), "ts", "event_id", "value"
    ).join(F.broadcast(stats), "symbol")
    az = F.when(
        F.col("std_v") != 0, F.abs((F.col("value") - F.col("mean_v")) / F.col("std_v"))
    )
    anomalies = scored.select(
        "symbol", "ts", "event_id", az.alias("az")
    ).filter(F.col("az") > z_cut)
    w = Window.partitionBy("symbol").orderBy("ts", "event_id")
    gap = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ) / F.lit(1_000_000.0)
    flagged = anomalies.withColumn(
        "new_ep", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    wc = Window.partitionBy("symbol").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    eps = flagged.withColumn("episode", F.sum("new_ep").over(wc))
    return (
        eps.groupBy("symbol", "episode")
        .agg(
            F.min("ts").alias("episode_start"),
            F.max("ts").alias("episode_end"),
            F.count(F.lit(1)).alias("n_events"),
            qround(F.max("az"), 6).alias("peak_z"),
        )
        .orderBy("symbol", "episode")
    )


def benford_check(events: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit of the value column: observed vs
    expected (log10(1 + 1/d)) share per leading digit plus each digit's
    chi-square contribution -- the classic fabricated-data / broken-feed
    screen (organic multiplicative data follows Benford; synthetic or
    truncated feeds deviate loudly).  Non-positive values carry no
    leading significant digit and are excluded (counted in the report's
    denominator note via n_total vs n_used is unnecessary -- the shares
    are over used rows, the standard formulation).

    Scale: the leading digit is a pure per-row expression
    (``floor(v / 10^floor(log10 v))``); one partial-agg groupBy at digit
    cardinality (9 rows) ends the query.  Nothing downstream is
    data-sized."""
    from ..functions.numeric import qround

    v = F.col("value")
    raw_digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    # ulp armor: log10 of a value one double below a power of ten rounds
    # UP to the integer (999.9999999999999 -> 3.0), making the quotient
    # 0.99... and the raw digit 0 (true digit 9); the mirror edge can
    # produce 10.  Both map back explicitly -- the same CASE runs in the
    # oracle, so the correction is itself hash-checked.
    digit = (
        F.when(raw_digit == 0, F.lit(9))
        .when(raw_digit == 10, F.lit(1))
        .otherwise(raw_digit)
    )
    used = events.filter(v > 0).select(digit.alias("digit"))
    counts = used.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    # Constant 1..9 digit spine: a digit with ZERO observations must
    # still appear in the report -- it carries the LARGEST possible
    # chi-square term (expected * n_total), so omitting it silently
    # understates the deviation exactly when the data is most skewed.
    spine = events.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = spine.join(counts, "digit", "left").select(
        "digit", F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs")
    )
    total = counts.agg(
        F.coalesce(F.sum("n_obs"), F.lit(0)).cast("double").alias("n_total")
    )
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    nt = F.col("n_total")
    obs_share = F.when(nt != 0, F.col("n_obs") / nt)
    chi2 = F.when(
        nt != 0,
        (F.col("n_obs") / nt - expected)
        * (F.col("n_obs") / nt - expected)
        / expected
        * nt,
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            qround(obs_share, 6).alias("obs_share"),
            qround(expected, 6).alias("benford_share"),
            qround(chi2, 6).alias("chi2_contrib"),
        )
        .orderBy("digit")
    )


def expectation_report(
    events: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Data-contract expectation suite (the Great-Expectations /
    dbt-tests shape, engine-native): one row per declared expectation
    with checked/failed counts, the failure rate, and a pass flag --
    what a lakehouse runs between bronze and silver to quarantine a bad
    batch before it poisons downstream gold tables.

    Checks: column completeness (non-NULL rates), domain constraints
    (value >= 0, totalprice > 0, enum membership of event_type, ts
    within the sane epoch range), and referential integrity
    (orders.o_custkey -> customer, lineitem.l_orderkey -> orders).

    Scale: every scalar check is a map-side partial-aggregated
    conditional count -- ALL events-table checks share ONE scan/agg (a
    single groupBy-less agg emits every counter at once, then unpivots).
    The FK checks are anti-join counts: Catalyst broadcasts the dim
    side (customer) and shuffle-joins the fact-fact pair; at 100 TB the
    orders->lineitem check rides the same bucketing as the revenue
    joins.  Output is expectation-cardinality (8 rows)."""
    from ..functions.numeric import qround

    from .rollup import EVENT_TYPES  # ONE definition of the contract enum

    enum = tuple(EVENT_TYPES)

    # coalesce every counter: F.sum over an EMPTY table is NULL, and the
    # report must stay well-typed (0 failures of 0 checks) on empty input
    def cnt(cond):
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))

    ev_counts = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        cnt(F.col("value").isNull()).alias("f_value_null"),
        cnt(F.col("value") < 0).alias("f_value_neg"),
        cnt(F.col("user_id").isNull()).alias("f_user_null"),
        cnt(~F.col("event_type").isin(*enum)).alias("f_bad_type"),
        cnt(
            (F.col("ts") < F.lit("2000-01-01").cast("timestamp"))
            | (F.col("ts") >= F.lit("2100-01-01").cast("timestamp"))
        ).alias("f_ts_range"),
    )
    ev_checks = ev_counts.select(
        F.expr(
            "stack(5, "
            "'events_value_not_null', n_rows, f_value_null, "
            "'events_value_non_negative', n_rows, f_value_neg, "
            "'events_user_id_not_null', n_rows, f_user_null, "
            "'events_event_type_in_enum', n_rows, f_bad_type, "
            "'events_ts_in_epoch_range', n_rows, f_ts_range"
            ") AS (check_name, n_checked, n_failed)"
        )
    )
    o_price = orders.agg(
        F.count(F.lit(1)).alias("n_checked"),
        cnt(F.col("o_totalprice") <= 0).alias("n_failed"),
    ).select(F.lit("orders_totalprice_positive").alias("check_name"), "n_checked", "n_failed")
    fk_cust = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_failed"))
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("n_checked")))
        .select(F.lit("orders_custkey_fk_customer").alias("check_name"), "n_checked", "n_failed")
    )
    fk_ord = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_failed"))
        .crossJoin(lineitem.agg(F.count(F.lit(1)).alias("n_checked")))
        .select(F.lit("lineitem_orderkey_fk_orders").alias("check_name"), "n_checked", "n_failed")
    )
    report = ev_checks.unionByName(o_price).unionByName(fk_cust).unionByName(fk_ord)
    return report.select(
        "check_name",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_failed").cast("long").alias("n_failed"),
        qround(
            F.when(
                F.col("n_checked") != 0,
                F.col("n_failed").cast("double") / F.col("n_checked"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("fail_rate"),
        (F.col("n_failed") == 0).alias("passed"),
    ).orderBy("check_name")


def psi_drift(events: DataFrame, n_bins: int = 10, psi_alert: float = 0.2) -> DataFrame:
    """Population-stability-index drift monitor: split the event stream
    at its time midpoint into a REFERENCE half and a CURRENT half, bin
    the value distribution on a fixed global grid, and report per symbol
    PSI = sum((cur% - ref%) * ln(cur% / ref%)) with additive (Laplace)
    smoothing -- the standard ML-ops screen for "has this feature's
    distribution moved since the model was fit".  PSI > 0.2 is the
    conventional re-train alert.

    Scale: the global (min ts, max ts, min value, max value) frame is a
    single partial-agg scan broadcast back as one row; binning is then a
    pure projection and the whole report is ONE groupBy at
    (symbol x bin) cardinality re-aggregated to symbol rows.  The time
    split uses integer epoch-micros so both engines cut identically."""
    from ..functions.numeric import qround

    vals = events.filter(F.col("value").isNotNull())
    # floor-div midpoint: Spark casts double->long by TRUNCATION while
    # DuckDB's cast ROUNDS, so both sides must floor explicitly
    bounds = vals.agg(
        F.floor((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid_us"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    binned = vals.crossJoin(F.broadcast(bounds)).select(
        F.col("event_type").alias("symbol"),
        (F.unix_micros("ts") > F.col("mid_us")).alias("is_cur"),
        F.when(
            F.col("vmax") != F.col("vmin"),
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * n_bins
                ),
                F.lit(n_bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("bin"),
    )
    cells = binned.groupBy("symbol", "bin").agg(
        F.sum(F.when(~F.col("is_cur"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_cur"), 1).otherwise(0)).alias("n_cur"),
    )
    return psi_from_cells(cells, n_bins=n_bins, psi_alert=psi_alert)


def psi_from_cells(
    cells: DataFrame, n_bins: int = 10, psi_alert: float = 0.2
) -> DataFrame:
    """PSI rollup from a (symbol, bin, n_ref, n_cur) cell frame -- shared
    by the batch monitor and the streaming twin (whose cells come from
    micro-batch partial counts), so both paths compute the bit-identical
    statistic and share one oracle.  Laplace smoothing
    (n + 0.5) / (N + 0.5 * n_bins) keeps every share strictly positive
    so ln() is always defined; the full (symbol x n_bins) grid is
    materialized first (round-12, the js_divergence_drift discipline) so
    bins empty in BOTH halves still contribute their +0.5 mass and the
    smoothed shares sum to exactly 1 -- occupied-cells-only P/Q would be
    biased vs the definition whenever t_ref != t_cur.  Everything here
    runs at (|symbols| x n_bins) cardinality."""
    from ..functions.numeric import qround

    grid = (
        cells.select("symbol")
        .distinct()
        .select(
            "symbol",
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        )
    )
    # every frame here is (|symbols| x n_bins)-bounded -- broadcast the
    # probe sides so the grid completion and the totals re-join stay
    # hash joins at any scale (a plain join planned an SMJ on symbol)
    cells = (
        grid.join(F.broadcast(cells), ["symbol", "bin"], "left")
        .na.fill(0, ["n_ref", "n_cur"])
    )
    totals = cells.groupBy("symbol").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    joined = cells.join(F.broadcast(totals), "symbol")
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * n_bins)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * n_bins)
    contrib = (p_cur - p_ref) * F.log(p_cur / p_ref)
    per_symbol = (
        joined.select("symbol", "n_ref", "n_cur", contrib.alias("c"))
        .groupBy("symbol")
        .agg(
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
            F.sum("c").alias("psi"),
        )
    )
    return per_symbol.select(
        "symbol",
        "n_ref",
        "n_cur",
        qround(F.col("psi"), 6).alias("psi"),
        (F.col("psi") > psi_alert).alias("drift_alert"),
    ).orderBy("symbol")


def ts_monotonicity_report(events: DataFrame) -> DataFrame:
    """Event-time disorder audit per symbol: how out-of-order is the feed
    in ARRIVAL order (event_id) -- the measurement that justifies a
    streaming watermark setting.  A row is out-of-order when its event
    time precedes the running max of everything that arrived before it;
    ``max_late_s`` is the worst such regression in seconds, i.e. the
    smallest watermark delay that would have dropped zero rows.

    Scale: one (symbol, arrival) window sort; the running max is O(1)
    state per task; the report is a partial-agg groupBy at symbol
    cardinality."""
    from pyspark.sql import Window

    from ..functions.numeric import qround

    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("ts").over(w)
    late_s = (
        F.unix_micros(prev_max) - F.unix_micros(F.col("ts"))
    ).cast("double") / 1e6
    tagged = events.select(
        F.col("event_type").alias("symbol"),
        F.when(late_s > 0, late_s).alias("late_s"),
    )
    return (
        tagged.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("late_s").alias("n_out_of_order"),
            qround(
                F.count("late_s").cast("double") / F.count(F.lit(1)), 6
            ).alias("ooo_rate"),
            qround(F.coalesce(F.max("late_s"), F.lit(0.0)), 6).alias("max_late_s"),
        )
        .orderBy("symbol")
    )


def ri_orphans(tables: dict[str, DataFrame]) -> DataFrame:
    """Referential-integrity audit over the star schema's FK edges: for
    each child.fk -> parent.pk edge, the child row count, how many
    non-NULL child keys have no parent (orphans), and the orphan rate.
    This is the first gate a lakehouse runs before trusting a source's
    joins -- orphaned facts silently vanish from inner-join gold tables.

    Scale: each edge is one LEFT join of the child against the parent's
    DISTINCT keys (dimension key sets broadcast; the one fact-to-fact
    edge, lineitem->orders, shuffles keys only) folded into a count/sum
    aggregate -- no orphan rows are ever materialized, just counted.
    Edges evaluate independently, so the report parallelizes trivially."""
    edges = [
        ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    reports = []
    for edge, child_name, fk, parent_name, pk in edges:
        child = tables[child_name]
        parent_keys = tables[parent_name].select(
            F.col(pk).alias("__pk")
        ).distinct()
        if parent_name != "orders":
            parent_keys = F.broadcast(parent_keys)
        joined = child.select(F.col(fk).alias("__fk")).join(
            parent_keys, F.col("__fk") == F.col("__pk"), "left"
        )
        orphan = F.col("__fk").isNotNull() & F.col("__pk").isNull()
        reports.append(
            joined.agg(
                F.lit(edge).alias("fk_edge"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(orphan.cast("long")).alias("n_orphans"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.select(
        "fk_edge",
        "n_rows",
        F.coalesce(F.col("n_orphans"), F.lit(0)).alias("n_orphans"),
        # ANSI-safe: empty child tables report NULL rate, not DIVIDE_BY_ZERO
        F.when(
            F.col("n_rows") > 0,
            F.floor(
                F.coalesce(F.col("n_orphans"), F.lit(0)) / F.col("n_rows") * 1e6
                + F.lit(0.5)
            )
            / F.lit(1e6),
        ).alias("orphan_rate"),
    ).orderBy("fk_edge")


def fd_check(tables: dict[str, DataFrame]) -> DataFrame:
    """Functional-dependency audit: for each candidate determinant ->
    dependent rule, how many determinant groups exist and how many carry
    MORE than one distinct dependent value (violations).  Key-uniqueness
    checks are the special case where the determinant is a declared key
    -- the profile a pipeline runs before trusting MERGE keys or
    dimension lookups.

    Scale: each rule is one partial-aggregable groupBy on the
    determinant followed by a count at group cardinality; violating
    groups are counted, never materialized."""
    rules = [
        ("customer.c_custkey->c_name", "customer", ["c_custkey"], "c_name"),
        ("orders.o_orderkey->o_custkey", "orders", ["o_orderkey"], "o_custkey"),
        ("lineitem.(l_orderkey,l_linenumber)->l_partkey", "lineitem",
         ["l_orderkey", "l_linenumber"], "l_partkey"),
        ("nation.n_nationkey->n_name", "nation", ["n_nationkey"], "n_name"),
        ("events.event_id->user_id", "events", ["event_id"], "user_id"),
        ("documents.doc_id->source", "documents", ["doc_id"], "source"),
    ]
    reports = []
    for rule, table, det, dep in rules:
        grouped = tables[table].groupBy(*det).agg(
            F.countDistinct(dep).alias("__nd")
        )
        reports.append(
            grouped.agg(
                F.lit(rule).alias("dependency"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum((F.col("__nd") > 1).cast("long")).alias("n_violations"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.select(
        "dependency",
        "n_groups",
        F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("holds"),
    ).orderBy("dependency")


def kmv_set_ops(events: DataFrame, k: int = 64) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches, fully audited:
    sketch the distinct clicking users (A) and purchasing users (B) as
    their k smallest md5 hashes, estimate |A u B| from the union
    sketch's k-th minimum, and |A n B| as rho * est_union where rho is
    the fraction of union-sketch members present in BOTH sets -- the
    standard mergeable-sketch algebra that answers audience-overlap
    questions at 100 TB without ever materializing the sets.  md5 makes
    every chosen hash engine-stable, so estimates AND exact values are
    oracle-checkable side by side (the kmv_distinct_estimate template).

    Scale: per-set dedup partial-aggregates map-side; bottom-k is a
    WindowGroupLimit rank (O(k) per task before the exchange); the rho
    membership join touches k rows against two hashed key sets."""
    from ..functions.hashing import md5_long
    from ..functions.numeric import qround

    def _hashes(etype: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == etype)
            .select(md5_long(F.col("user_id").cast("string")).alias("h"))
            .distinct()
        )

    ha, hb = _hashes("click"), _hashes("purchase")
    union_h = ha.unionAll(hb).distinct()
    # global bottom-k via TakeOrdered (per-partition top-k then a k-row
    # merge on the driver side of the exchange) -- NOT a global window,
    # which would funnel every hash through one task
    union_sketch = union_h.orderBy("h").limit(k)
    in_a = union_sketch.join(ha.withColumnRenamed("h", "h_a"),
                             F.col("h") == F.col("h_a"), "left")
    in_ab = in_a.join(hb.withColumnRenamed("h", "h_b"),
                      F.col("h") == F.col("h_b"), "left")
    sk = in_ab.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
        F.sum(
            (F.col("h_a").isNotNull() & F.col("h_b").isNotNull()).cast("long")
        ).alias("n_rho"),
    )
    exacts = (
        union_h.agg(F.count(F.lit(1)).alias("exact_union"))
        .crossJoin(
            ha.join(hb, "h", "semi").agg(F.count(F.lit(1)).alias("exact_inter"))
        )
    )
    est_union = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(1152921504606846976.0) / F.col("h_k")
    )
    est_inter = F.col("n_rho") / F.col("n_kept") * est_union
    return (
        sk.crossJoin(exacts)
        .select(
            F.lit(k).alias("k"),
            "n_kept",
            "n_rho",
            qround(est_union, 4).alias("est_union"),
            F.col("exact_union"),
            qround(
                F.when(
                    F.col("exact_union") > 0,
                    F.abs(est_union - F.col("exact_union")) / F.col("exact_union"),
                ),
                6,
            ).alias("union_rel_error"),
            qround(est_inter, 4).alias("est_intersection"),
            F.col("exact_inter").alias("exact_intersection"),
        )
    )


def ks_two_sample(events: DataFrame, split_ts: str = "2024-01-16") -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per symbol: the first
    half of the month vs the second, KS statistic = max |ECDF1 - ECDF2|
    evaluated at every distinct observed value from cumulative INTEGER
    counts (exact on both engines -- no float accumulation anywhere
    until the final ratios), with the alpha=0.05 decision against the
    asymptotic critical value 1.36 * sqrt((n+m)/(n*m)).  The classic
    distribution-shift gate next to psi_drift's binned score.

    Scale: one groupBy to (symbol, value) cardinality with split counts,
    one cumulative window over the per-symbol sorted values, one
    symbol-cardinality max -- the ECDFs are never materialized row-wise."""
    from ..functions.numeric import qround

    from pyspark.sql import Window

    split = F.lit(split_ts).cast("timestamp")
    # NULL values must not enter the ECDF: they would form a rollup group
    # that Spark window-orders NULLS FIRST but DuckDB NULLS LAST, and a
    # NULL observation has no place in a distribution test anyway (same
    # contract as psi_drift / expectation_report).
    counted = events.filter(F.col("value").isNotNull()).groupBy(
        F.col("event_type").alias("symbol"), "value"
    ).agg(
        F.sum((F.col("ts") < split).cast("long")).alias("c1"),
        F.sum((F.col("ts") >= split).cast("long")).alias("c2"),
    )
    w = Window.partitionBy("symbol").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("symbol")
    cum = counted.select(
        "symbol",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(tot).alias("n"),
        F.sum("c2").over(tot).alias("m"),
    )
    diff = F.abs(
        F.col("cum1") / F.col("n") - F.col("cum2") / F.col("m")
    )
    per_sym = cum.filter((F.col("n") > 0) & (F.col("m") > 0)).groupBy(
        "symbol"
    ).agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        qround(F.max(diff), 6).alias("ks_stat"),
    )
    crit = F.lit(1.36) * F.sqrt(
        (F.col("n") + F.col("m")) / (F.col("n") * F.col("m"))
    )
    return per_sym.select(
        "symbol",
        "n",
        "m",
        "ks_stat",
        qround(crit, 6).alias("critical_05"),
        (F.col("ks_stat") > qround(crit, 6)).alias("drift_detected"),
    ).orderBy("symbol")


def dp_noise_counts(events: DataFrame, epsilon: float = 1.0) -> DataFrame:
    """Laplace-mechanism count release per event type: the exact count
    plus Laplace(1/epsilon) noise via the inverse-CDF transform

        noise = -(1/eps) * sign(u - 0.5) * ln(1 - 2|u - 0.5|)

    with the uniform u derived DETERMINISTICALLY from md5 of the group
    key.  Stated honestly: a fixed seed is NOT differential privacy --
    it makes the release auditable and the transform oracle-checkable;
    a production deployment swaps the md5 uniform for a CSPRNG draw and
    keeps everything else (sensitivity-1 counts, the inverse CDF, the
    epsilon accounting) exactly as tested here.

    Scale: one partial-aggregable groupBy; the noise is per-GROUP
    projection arithmetic at output cardinality."""
    from ..functions.hashing import md5_long
    from ..functions.numeric import qround

    counts = events.groupBy(F.col("event_type")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    # u in (0, 1): 20-bit md5 bucket shifted off the endpoints
    u = (
        (md5_long(F.concat_ws(":", F.lit("dp"), F.col("event_type"))) % 1048576)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(1048576.0)
    b = 1.0 / epsilon
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        "event_type",
        "true_count",
        qround(noise, 6).alias("laplace_noise"),
        qround(F.col("true_count") + noise, 6).alias("released_count"),
        F.lit(float(epsilon)).alias("epsilon"),
    ).orderBy("event_type")


def mutual_information_profile(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Dependency audit between the event type and the value
    distribution: the mutual information (nats), normalized MI, and the
    chi-square statistic of the (event_type x value-bin) contingency
    table -- the feature-selection screen that says whether a
    categorical column actually carries signal about a numeric one
    before anyone trains on it.  Value bins are ``n_bins`` equal-width
    slices of the global [min, max] (broadcast bounds, the
    ``volume_profile`` discipline) -- NOT ntile, whose global sort is a
    single-partition bottleneck at 100 TB.

    Scale: bounds are a 1-row broadcast; the contingency is one
    partial-aggregable (type, bin) groupBy; margins and the MI/chi2
    sums run at cell cardinality (|types| x n_bins).  Determinism:
    every cell term is exact-integer arithmetic composed identically on
    both engines; only the final cell-sum order differs, absorbed by
    the 1e-6 quantization."""
    from pyspark.sql import Window

    from ..functions.numeric import qround

    bounds = events.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    src = events.select(F.col("event_type").alias("t"), "value").crossJoin(
        F.broadcast(bounds)
    )
    bin_col = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.floor(
                (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * n_bins
            ),
            F.lit(n_bins - 1),
        ),
    ).otherwise(F.lit(0))
    cells = src.select("t", bin_col.alias("b")).groupBy("t", "b").agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    w_all = Window.partitionBy()
    w_t = Window.partitionBy("t")
    w_b = Window.partitionBy("b")
    framed = cells.select(
        "t",
        "b",
        F.col("n_ij").cast("double").alias("n_ij"),
        F.sum("n_ij").over(w_t).cast("double").alias("n_i"),
        F.sum("n_ij").over(w_b).cast("double").alias("n_j"),
        F.sum("n_ij").over(w_all).cast("double").alias("n"),
    )
    p = F.col("n_ij") / F.col("n")
    mi_term = p * F.log(F.col("n_ij") * F.col("n") / (F.col("n_i") * F.col("n_j")))
    # chi2 via the identity N (sum n_ij^2 / (n_i n_j) - 1): zero cells
    # (absent from the sparse contingency) contribute nothing to the sum
    # but ARE accounted for, unlike the naive (O-E)^2/E over present
    # cells only, which understates the statistic.
    chi_term = F.col("n_ij") * F.col("n_ij") / (F.col("n_i") * F.col("n_j"))
    # Entropies come from the margins: summing a margin term per cell
    # would repeat it across cells -- aggregate the distinct margins.
    rows_h = framed.select("t", "n_i", "n").distinct().agg(
        qround(
            F.sum(-(F.col("n_i") / F.col("n")) * F.log(F.col("n_i") / F.col("n"))), 12
        ).alias("h_rows")
    )
    cols_h = framed.select("b", "n_j", "n").distinct().agg(
        qround(
            F.sum(-(F.col("n_j") / F.col("n")) * F.log(F.col("n_j") / F.col("n"))), 12
        ).alias("h_cols")
    )
    stats = framed.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n").cast("long").alias("n_rows"),
        F.countDistinct("t").alias("n_types"),
        F.countDistinct("b").alias("n_bins_used"),
        qround(F.sum(mi_term), 12).alias("mi_q"),
        qround(F.max("n") * (F.sum(chi_term) - 1.0), 6).alias("chi2"),
    )
    joined = stats.crossJoin(F.broadcast(rows_h)).crossJoin(F.broadcast(cols_h))
    denom = F.sqrt(F.col("h_rows") * F.col("h_cols"))
    return joined.select(
        "n_rows",
        "n_types",
        "n_bins_used",
        "n_cells",
        qround(F.col("mi_q"), 6).alias("mi_nats"),
        F.when(denom > 0, qround(F.col("mi_q") / denom, 6)).alias("nmi"),
        "chi2",
        ((F.col("n_types") - 1) * (F.col("n_bins_used") - 1)).alias("dof"),
    )


def k_anonymity_report(events: DataFrame) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple
    (event_type, day, value-hundreds-bucket): the group-size
    distribution a privacy review reads before releasing event-level
    training data -- the minimum k, and the fraction of rows sitting in
    groups smaller than 2 / 5 / 10 (rows that would re-identify under
    the respective k-anonymity bar).

    Scale: one partial-aggregable groupBy to QI-group cardinality, then
    ONE single-row aggregate -- group sizes are exact integers, shares
    quantized.  The QI bucketing is scan-side arithmetic (floor of
    value/100), no sort, no window at row cardinality."""
    from ..functions.numeric import qround

    qi = events.groupBy(
        F.col("event_type").alias("qi_type"),
        F.date_trunc("day", F.col("ts")).alias("qi_day"),
        F.floor(F.col("value") / 100.0).alias("qi_band"),
    ).agg(F.count(F.lit(1)).alias("g"))
    total = F.sum("g")
    return qi.agg(
        total.cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("g").alias("min_k"),
        qround(F.avg(F.col("g").cast("double")), 4).alias("avg_group_size"),
        qround(F.sum(F.when(F.col("g") < 2, F.col("g")).otherwise(0)) / total, 6).alias(
            "pct_rows_k_lt_2"
        ),
        qround(F.sum(F.when(F.col("g") < 5, F.col("g")).otherwise(0)) / total, 6).alias(
            "pct_rows_k_lt_5"
        ),
        qround(
            F.sum(F.when(F.col("g") < 10, F.col("g")).otherwise(0)) / total, 6
        ).alias("pct_rows_k_lt_10"),
    )


def l_diversity_report(events: DataFrame) -> DataFrame:
    """l-diversity audit over the same quasi-identifier tuple as
    ``k_anonymity_report`` (event_type, day, value-hundreds-bucket),
    with ``user_id`` as the sensitive attribute: per QI group, l =
    distinct sensitive values; report the minimum l, the mean, and the
    share of groups / rows where every record maps to fewer than 2 or 3
    distinct users -- the attribute-disclosure check k-anonymity alone
    misses (a group of 50 rows all belonging to ONE user is 50-anonymous
    and still fully identifying).

    Scale: one partial-aggregable groupBy to QI-group cardinality (the
    distinct-count is per-group exact; swap approx_count_distinct at
    100 TB), then ONE single-row aggregate.  Every reported share is a
    ratio of exact integers."""
    from ..functions.numeric import qround

    qi = events.groupBy(
        F.col("event_type").alias("qi_type"),
        F.date_trunc("day", F.col("ts")).alias("qi_day"),
        F.floor(F.col("value") / 100.0).alias("qi_band"),
    ).agg(
        F.count(F.lit(1)).alias("g"),
        F.countDistinct("user_id").alias("l"),
    )
    total = F.sum("g")
    n_groups = F.count(F.lit(1))
    return qi.agg(
        total.cast("long").alias("n_rows"),
        n_groups.alias("n_groups"),
        F.min("l").alias("min_l"),
        qround(F.avg(F.col("l").cast("double")), 4).alias("avg_l"),
        qround(
            F.sum(F.when(F.col("l") < 2, 1).otherwise(0)) / n_groups, 6
        ).alias("pct_groups_l_lt_2"),
        qround(
            F.sum(F.when(F.col("l") < 2, F.col("g")).otherwise(0)) / total, 6
        ).alias("pct_rows_l_lt_2"),
        qround(
            F.sum(F.when(F.col("l") < 3, F.col("g")).otherwise(0)) / total, 6
        ).alias("pct_rows_l_lt_3"),
    )


def js_divergence_drift(
    events: DataFrame, n_bins: int = 10, jsd_alert: float = 0.1
) -> DataFrame:
    """Jensen-Shannon drift monitor: the same midpoint time split and
    fixed global value grid as ``psi_drift``, but scored with the
    symmetric, BOUNDED Jensen-Shannon divergence JSD = 0.5*KL(P||M) +
    0.5*KL(Q||M), M = (P+Q)/2 -- always in [0, ln 2], so one saturated
    bin cannot blow the statistic up the way it inflates PSI, and the
    normalized score is comparable ACROSS symbols with very different
    bin occupancies.  Laplace smoothing runs over the FULL materialized
    (symbol x n_bins) grid -- bins empty in both halves still contribute
    their +0.5 mass, so the smoothed P and Q each sum to exactly 1 --
    and keeps every share strictly positive; alert at ``jsd_alert`` on
    the raw (nats) value.

    Scale: identical to psi_drift -- one broadcast bounds row, one
    groupBy at (symbol x bin) cardinality, one symbol rollup.
    Determinism: shares are rationals of exact integers, each ln() is
    quantized at 12 dp (libm-ulp isolation, the kupiec discipline), and
    per-cell contributions snap to pico-unit BIGINTs so the symbol sum
    is order-independent."""
    from ..functions.numeric import qround

    vals = events.filter(F.col("value").isNotNull())
    bounds = vals.agg(
        F.floor((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid_us"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    binned = vals.crossJoin(F.broadcast(bounds)).select(
        F.col("event_type").alias("symbol"),
        (F.unix_micros("ts") > F.col("mid_us")).alias("is_cur"),
        F.when(
            F.col("vmax") != F.col("vmin"),
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * n_bins
                ),
                F.lit(n_bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("bin"),
    )
    occupied = binned.groupBy("symbol", "bin").agg(
        F.sum(F.when(~F.col("is_cur"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_cur"), 1).otherwise(0)).alias("n_cur"),
    )
    # Materialize ALL n_bins cells per symbol (the t_closeness_report
    # discipline; round-11 advisor finding): Laplace smoothing with
    # denominator t + 0.5*n_bins is only a probability distribution if
    # every bin contributes its +0.5, including bins empty in BOTH
    # halves -- occupied-cells-only P/Q would not sum to 1 and the JSD
    # would be biased vs the full-grid definition.  The grid is
    # |symbols| x n_bins rows -- negligible at any scale.
    grid = (
        occupied.select("symbol")
        .distinct()
        .select(
            "symbol",
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        )
    )
    cells = (
        grid.join(F.broadcast(occupied), ["symbol", "bin"], "left")
        .na.fill(0, ["n_ref", "n_cur"])
    )
    totals = cells.groupBy("symbol").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    half_b = F.lit(0.5 * n_bins)
    joined = cells.join(F.broadcast(totals), "symbol").select(
        "symbol",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + F.lit(0.5)) / (F.col("t_ref") + half_b)).alias("p"),
        ((F.col("n_cur") + F.lit(0.5)) / (F.col("t_cur") + half_b)).alias("q"),
    )
    with_m = joined.select(
        "symbol",
        "n_ref",
        "n_cur",
        "p",
        "q",
        ((F.col("p") + F.col("q")) / F.lit(2.0)).alias("m"),
    )
    lp = qround(F.log(F.col("p") / F.col("m")), 12)
    lq = qround(F.log(F.col("q") / F.col("m")), 12)
    contrib_u = F.floor(
        F.lit(0.5) * (F.col("p") * lp + F.col("q") * lq) * F.lit(1e12)
        + F.lit(0.5)
    ).cast("long")
    per_symbol = (
        with_m.select("symbol", "n_ref", "n_cur", contrib_u.alias("c_u"))
        .groupBy("symbol")
        .agg(
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
            F.sum("c_u").alias("sum_u"),
        )
    )
    jsd_raw = F.col("sum_u").cast("double") / F.lit(1e12)
    ln2 = F.lit(0.6931471805599453)
    return per_symbol.select(
        "symbol",
        "n_ref",
        "n_cur",
        qround(jsd_raw, 6).alias("jsd"),
        qround(jsd_raw / ln2, 6).alias("jsd_normalized"),
        (jsd_raw > F.lit(float(jsd_alert))).alias("drift_alert"),
    ).orderBy("symbol")
