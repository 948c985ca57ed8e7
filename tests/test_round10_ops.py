"""Round-10 operator referees: liquidity, jump decomposition,
variance-ratio diagnostics, intraday seasonality, drawdown episodes,
tail risk, n-gram novelty, l-diversity, PII density, shard skew, and
the streaming OHLC merge twin.

Each test checks SEMANTICS independently of the DuckDB oracle (which
only proves both engines execute the same expressions): pure-Python /
numpy re-derivations over the fixture parquet, plus planted frames with
analytically known answers.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from conftest import SF_SMOKE
from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators import finance, pipeline, text

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def _qr(x: float, d: int = 6) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _tick_frame(spark, closes, symbol="sym"):
    """One tick per day at a fixed hour -> the daily close path IS the
    tick path (deterministic single-tick days)."""
    rows = [
        (
            i + 1,
            dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=12),
            1,
            symbol,
            float(c),
            '{"k": "1.0"}',
        )
        for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _intraday_frame(spark, values, symbol="sym"):
    """All ticks inside ONE day, one minute apart."""
    rows = [
        (
            i + 1,
            dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(minutes=i),
            1,
            symbol,
            float(v),
            '{"k": "1.0"}',
        )
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


# ---------------------------------------------------------------------------
# amihud_illiquidity
# ---------------------------------------------------------------------------


def test_amihud_planted_two_days(spark):
    # day closes 100 -> 110 (return .1), qty 1 per tick => day-2 dv = 110
    ev = _tick_frame(spark, [100.0, 110.0])
    row = finance.amihud_illiquidity(ev).collect()[0]
    assert row["n_days"] == 1
    assert row["amihud_x1e6"] == pytest.approx(
        _qr(abs(0.1) / 110.0 * 1e6), abs=1e-6
    )
    assert row["avg_dollar_volume"] == pytest.approx(110.0, abs=1e-2)


def test_amihud_matches_numpy_on_fixture(spark):
    import numpy as np
    import pandas as pd

    rows = finance.amihud_illiquidity(_events(spark)).collect()
    assert rows
    # the original operator takes ALL ticks (no positivity filter)
    pdf = _events(spark).toPandas().sort_values(["event_type", "ts", "event_id"])
    pdf["day"] = pdf["ts"].dt.floor("D")
    pdf["qty"] = pd.to_numeric(
        pdf["props"].str.extract(r'"k":\s*"?([0-9.eE+-]+)"?')[0], errors="coerce"
    )
    sym = rows[0]["symbol"]
    g = pdf[pdf.event_type == sym]
    daily = g.groupby("day").agg(c=("value", "last"))
    daily["dv"] = g.assign(d=g.value * g.qty).groupby("day")["d"].sum(min_count=1)
    r = daily["c"].pct_change()
    ok = (~r.isna()) & (daily["dv"] > 0)
    expect = _qr((r[ok].abs() / daily["dv"][ok]).mean() * 1e6, 6)
    assert rows[0]["amihud_x1e6"] == pytest.approx(expect, abs=2e-6)


# ---------------------------------------------------------------------------
# bipower_variation_jumps
# ---------------------------------------------------------------------------


def test_bipower_smooth_tape_has_no_jump(spark):
    # constant multiplicative step: |r_t| identical => BV/RV = (pi/2) *
    # (n-1)/n > 1 for n >= 3 => jump share exactly 0
    vals = [100.0 * (1.01**i) for i in range(10)]
    ev = _intraday_frame(spark, vals)
    row = finance.bipower_variation_jumps(ev).collect()[0]
    assert row["jump_share"] == 0.0
    assert row["n_jump_days"] == 0


def test_bipower_single_jump_dominates(spark):
    # flat tape with one 50% jump: RV ~ jump^2, BV ~ 0 => share ~ 1
    vals = [100.0] * 5 + [150.0] + [150.0] * 5
    ev = _intraday_frame(spark, vals)
    row = finance.bipower_variation_jumps(ev).collect()[0]
    assert row["jump_share"] is not None and row["jump_share"] > 0.9
    assert row["n_jump_days"] == 1


def test_bipower_matches_numpy_on_planted(spark):
    import numpy as np

    vals = [100.0, 103.0, 101.0, 108.0, 102.0, 105.0]
    ev = _intraday_frame(spark, vals)
    row = finance.bipower_variation_jumps(ev).collect()[0]
    lr = np.diff(np.log(vals))
    rv_u = math.floor(float(np.sum(lr * lr)) * 1e12 + 0.5)
    bv_u = math.floor(
        float(np.sum(np.abs(lr[1:]) * np.abs(lr[:-1]))) * (math.pi / 2) * 1e12
        + 0.5
    )
    assert row["rv_total"] == pytest.approx(_qr(rv_u / 1e12, 8), abs=1e-8)
    assert row["bv_total"] == pytest.approx(_qr(bv_u / 1e12, 8), abs=1e-8)


# ---------------------------------------------------------------------------
# variance_ratio
# ---------------------------------------------------------------------------


def test_variance_ratio_alternating_returns_mean_revert(spark):
    # closes alternating 100, 105: 1-day lr alternates +/-a (var = a^2);
    # every 2-day overlapping sum is exactly 0 except sign-repeat edges
    closes = [100.0, 105.0] * 15
    ev = _tick_frame(spark, closes)
    row = finance.variance_ratio(ev).collect()[0]
    assert row["vr_2"] is not None and row["vr_2"] < 0.2
    assert row["vr_5"] is not None and row["vr_5"] < 0.2


def test_variance_ratio_trending_tape_near_zero_var(spark):
    # perfectly exponential tape: lr constant => var_pop = 0 => NULL VRs
    closes = [100.0 * (1.02**i) for i in range(15)]
    ev = _tick_frame(spark, closes)
    row = finance.variance_ratio(ev).collect()[0]
    assert row["vr_2"] is None and row["vr_5"] is None


def test_variance_ratio_matches_numpy_on_fixture(spark):
    import numpy as np

    rows = finance.variance_ratio(_events(spark)).collect()
    assert rows
    pdf = (
        _events(spark)
        .toPandas()
        .query("value > 0")
        .sort_values(["event_type", "ts", "event_id"])
    )
    pdf["day"] = pdf["ts"].dt.floor("D")
    sym = rows[0]["symbol"]
    closes = (
        pdf[pdf.event_type == sym].groupby("day")["value"].last().sort_index()
    )
    lr = np.diff(np.log(closes.values))
    v1 = _qr(float(np.var(lr)), 12)
    r5 = np.convolve(lr, np.ones(5), "valid")
    v5 = _qr(float(np.var(r5)), 12)
    assert rows[0]["n_days"] == len(lr)
    assert rows[0]["vr_5"] == pytest.approx(_qr(v5 / (5 * v1), 6), abs=2e-6)


# ---------------------------------------------------------------------------
# intraday_seasonality
# ---------------------------------------------------------------------------


def test_intraday_seasonality_shares_sum_to_one(spark):
    rows = finance.intraday_seasonality(_events(spark)).collect()
    assert rows
    by_sym: dict[str, float] = {}
    for r in rows:
        assert 0 <= r["hour"] <= 23
        if r["dv_share"] is not None:
            by_sym[r["symbol"]] = by_sym.get(r["symbol"], 0.0) + r["dv_share"]
    for s, tot in by_sym.items():
        assert tot == pytest.approx(1.0, abs=1e-4), s


def test_intraday_seasonality_tick_totals(spark):
    rows = finance.intraday_seasonality(_events(spark)).collect()
    n = sum(r["n_ticks"] for r in rows)
    assert n == _events(spark).filter("value > 0").count()


# ---------------------------------------------------------------------------
# drawdown_episodes
# ---------------------------------------------------------------------------


def test_drawdown_planted_path(spark):
    # closes: highs at 10, 11, 12; two drawdown episodes between them
    ev = _tick_frame(spark, [10.0, 8.0, 9.0, 11.0, 7.0, 6.0, 12.0])
    row = finance.drawdown_episodes(ev).collect()[0]
    assert row["n_drawdowns"] == 2
    assert row["max_duration_days"] == 2
    d1_u = math.floor((1 - 8.0 / 10.0) * 1e6 + 0.5)
    d2_u = math.floor((1 - 6.0 / 11.0) * 1e6 + 0.5)
    assert row["max_depth"] == pytest.approx(d2_u / 1e6, abs=1e-9)
    assert row["avg_depth"] == pytest.approx(
        _qr((d1_u + d2_u) / 2 / 1e6, 6), abs=1e-9
    )


def test_drawdown_monotone_tape_has_none(spark):
    ev = _tick_frame(spark, [10.0, 11.0, 12.0, 13.0])
    assert finance.drawdown_episodes(ev).collect() == []


# ---------------------------------------------------------------------------
# historical_var_cvar
# ---------------------------------------------------------------------------


def test_var_cvar_matches_numpy_on_fixture(spark):
    import numpy as np

    rows = finance.historical_var_cvar(_events(spark)).collect()
    assert rows
    pdf = (
        _events(spark)
        .toPandas()
        .query("value > 0")
        .sort_values(["event_type", "ts", "event_id"])
    )
    pdf["day"] = pdf["ts"].dt.floor("D")
    for r in rows:
        closes = (
            pdf[pdf.event_type == r["symbol"]]
            .groupby("day")["value"]
            .last()
            .sort_index()
        )
        lr = np.array([_qr(x, 12) for x in np.diff(np.log(closes.values))])
        q05 = _qr(float(np.percentile(lr, 5, method="linear")), 12)
        tail = lr[lr <= q05]
        assert r["var_95"] == pytest.approx(_qr(q05, 6), abs=1e-6)
        assert r["n_tail"] == len(tail)
        assert r["cvar_95"] == pytest.approx(_qr(float(tail.mean()), 6), abs=2e-6)
        assert r["cvar_95"] <= r["var_95"]


# ---------------------------------------------------------------------------
# ngram_novelty_rate
# ---------------------------------------------------------------------------


def _nov_holdout(doc_id: int, mod: int = 5) -> bool:
    h = hashlib.md5(f"nov:{doc_id}".encode()).hexdigest()[:15]
    return int(h, 16) % mod == 0


def test_ngram_novelty_planted_half_novel(spark):
    train_id = next(i for i in range(1, 100) if not _nov_holdout(i))
    test_id = next(i for i in range(1, 100) if _nov_holdout(i))
    docs = spark.createDataFrame(
        [
            (train_id, "a b c d", "en", "s", 7),
            (test_id, "a b c x", "en", "s", 7),
        ],
        DOC_SCHEMA,
    )
    row = text.ngram_novelty_rate(docs).collect()[0]
    # holdout shingles {a b c, b c x}; train has {a b c, b c d} -> 1 novel
    assert row["n_holdout_ngrams"] == 2
    assert row["n_novel_ngrams"] == 1
    assert row["novelty_rate"] == 0.5


def test_ngram_novelty_bounds_on_fixture(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    for r in text.ngram_novelty_rate(docs).collect():
        assert 0 <= r["n_novel_ngrams"] <= r["n_holdout_ngrams"]
        assert 0.0 <= r["novelty_rate"] <= 1.0


# ---------------------------------------------------------------------------
# l_diversity_report
# ---------------------------------------------------------------------------


def test_l_diversity_matches_pandas(spark):
    from real_time_financial_lakehouse_spark.operators.profiling import (
        l_diversity_report,
    )

    row = l_diversity_report(_events(spark)).collect()[0]
    pdf = _events(spark).toPandas()
    pdf["day"] = pdf["ts"].dt.floor("D")
    pdf["band"] = (pdf["value"] / 100.0).apply(math.floor)
    g = pdf.groupby(["event_type", "day", "band"]).agg(
        g=("event_id", "size"), l=("user_id", "nunique")
    )
    assert row["n_rows"] == len(pdf)
    assert row["n_groups"] == len(g)
    assert row["min_l"] == g["l"].min()
    assert row["avg_l"] == pytest.approx(_qr(g["l"].mean(), 4), abs=1e-4)
    assert row["pct_rows_l_lt_2"] == pytest.approx(
        _qr(g[g["l"] < 2]["g"].sum() / len(pdf), 6), abs=1e-6
    )


# ---------------------------------------------------------------------------
# pii_density_by_source
# ---------------------------------------------------------------------------


def test_pii_density_planted_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a@b.com or c@d.org now", "en", "web", 34),
            (2, "call 555-123-4567 thanks", "en", "web", 24),
            (3, "clean text only", "en", "books", 15),
        ],
        DOC_SCHEMA,
    )
    rows = {r["source"]: r for r in pipeline.pii_density_by_source(docs).collect()}
    web = rows["web"]
    assert web["n_email"] == 2 and web["n_phone"] == 1
    n_chars = len("mail me at a@b.com or c@d.org now") + len(
        "call 555-123-4567 thanks"
    )
    assert web["n_chars"] == n_chars
    assert web["email_per_10k_chars"] == pytest.approx(
        _qr(2 * 10000.0 / n_chars, 6), abs=1e-6
    )
    books = rows["books"]
    assert books["n_email"] == 0 and books["email_per_10k_chars"] == 0.0


# ---------------------------------------------------------------------------
# shard_skew_report
# ---------------------------------------------------------------------------


def test_shard_skew_consistency_with_manifest(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    row = pipeline.shard_skew_report(docs, n_shards=16).collect()[0]
    manifest = pipeline.shard_manifest(docs, n_shards=16).collect()
    counts = [m["n_docs"] for m in manifest]
    mean = sum(counts) / len(counts)
    assert row["n_shards"] == len(manifest)
    assert row["n_docs"] == sum(counts)
    assert row["max_doc_skew"] == pytest.approx(max(counts) / mean, abs=1e-6)
    assert row["min_doc_skew"] == pytest.approx(min(counts) / mean, abs=1e-6)
    chi2 = sum((c - mean) ** 2 / mean for c in counts)
    assert row["chi2_docs"] == pytest.approx(chi2, abs=1e-4)
    assert row["min_doc_skew"] <= 1.0 <= row["max_doc_skew"]


# ---------------------------------------------------------------------------
# streaming_minute_ohlc
# ---------------------------------------------------------------------------


def test_streaming_minute_ohlc_equals_batch(spark):
    from real_time_financial_lakehouse_spark.operators.rollup import minute_ohlc
    from real_time_financial_lakehouse_spark.streaming.silver import (
        streaming_minute_ohlc,
    )
    from real_time_financial_lakehouse_spark.functions.numeric import qround

    from pyspark.sql import functions as F

    streamed = streaming_minute_ohlc(spark, SF_SMOKE).collect()
    batch = (
        minute_ohlc(_events(spark))
        .select(
            "symbol",
            "minute_window",
            "open_price",
            qround(F.col("high_price"), 6).alias("high_price"),
            qround(F.col("low_price"), 6).alias("low_price"),
            "close_price",
            qround(F.col("total_value"), 6).alias("total_value"),
            "n_trades",
        )
        .collect()
    )
    assert len(streamed) == len(batch) > 0
    key = lambda r: (r["minute_window"], r["symbol"])  # noqa: E731
    for s, b in zip(sorted(streamed, key=key), sorted(batch, key=key)):
        assert s["symbol"] == b["symbol"]
        assert s["minute_window"] == b["minute_window"]
        assert s["open_price"] == b["open_price"]
        assert s["close_price"] == b["close_price"]
        assert s["high_price"] == b["high_price"]
        assert s["low_price"] == b["low_price"]
        assert s["n_trades"] == b["n_trades"]
        # Exact: the streaming side accumulates BIGINT micro-units, so
        # the quantized total is identical however the stream shards.
        assert s["total_value"] == b["total_value"]


# ---------------------------------------------------------------------------
# return_moments_profile
# ---------------------------------------------------------------------------


def test_moments_symmetric_tape_zero_skew(spark):
    # closes alternate up/down by the same log step => lr alternates +/-a,
    # mean ~ 0, odd central moment ~ 0 => skewness 0; kurtosis of a
    # two-point symmetric distribution is 1 => excess -2
    closes = [100.0, 110.0] * 10 + [100.0]  # 20 returns, 10 up / 10 down
    ev = _tick_frame(spark, closes)
    row = finance.return_moments_profile(ev).collect()[0]
    assert row["skewness"] == pytest.approx(0.0, abs=1e-6)
    assert row["excess_kurtosis"] == pytest.approx(-2.0, abs=1e-6)
    assert row["jarque_bera"] == pytest.approx(
        _qr(row["n_days"] * (4.0 / 24.0), 4), abs=1e-4
    )


def test_moments_match_numpy_on_fixture(spark):
    import numpy as np

    rows = finance.return_moments_profile(_events(spark)).collect()
    assert rows
    pdf = (
        _events(spark)
        .toPandas()
        .query("value > 0")
        .sort_values(["event_type", "ts", "event_id"])
    )
    pdf["day"] = pdf["ts"].dt.floor("D")
    for r in rows:
        closes = (
            pdf[pdf.event_type == r["symbol"]]
            .groupby("day")["value"]
            .last()
            .sort_index()
        )
        lr = np.array([_qr(x, 12) for x in np.diff(np.log(closes.values))])
        mean_q = _qr(float(lr.mean()), 12)
        d = lr - mean_q
        m2 = _qr(float((d * d).mean()), 12)
        m3 = _qr(float((d * d * d).mean()), 12)
        m4 = _qr(float((d * d * d * d).mean()), 12)
        assert r["skewness"] == pytest.approx(
            _qr(m3 / (m2 * math.sqrt(m2)), 6), abs=2e-6
        )
        assert r["excess_kurtosis"] == pytest.approx(
            _qr(m4 / (m2 * m2) - 3.0, 6), abs=2e-6
        )


# ---------------------------------------------------------------------------
# cross_sectional_momentum
# ---------------------------------------------------------------------------


def test_momentum_planted_winner_loser(spark):
    import itertools

    rows = []
    eid = itertools.count(1)
    for i in range(12):
        day = dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i)
        for sym, mult in (("up", 1.05), ("flat", 1.0), ("down", 0.95)):
            rows.append(
                (next(eid), day, 1, sym, 100.0 * mult**i, '{"k": "1.0"}')
            )
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = {r["tercile"]: r for r in finance.cross_sectional_momentum(ev).collect()}
    assert set(out) == {1, 2, 3}
    # the winner tercile keeps winning (+5%/day), the loser keeps losing
    assert out[1]["avg_fwd_ret"] == pytest.approx(0.05, abs=1e-6)
    assert out[3]["avg_fwd_ret"] == pytest.approx(-0.05, abs=1e-6)
    assert out[1]["hit_rate"] == 1.0 and out[3]["hit_rate"] == 0.0


def test_momentum_obs_partition_on_fixture(spark):
    rows = finance.cross_sectional_momentum(_events(spark)).collect()
    assert rows and {r["tercile"] for r in rows} <= {1, 2, 3}
    for r in rows:
        assert 0.0 <= r["hit_rate"] <= 1.0


# ---------------------------------------------------------------------------
# lsh_banding_efficiency
# ---------------------------------------------------------------------------


def test_banding_efficiency_planted_identical_pair(spark):
    from real_time_financial_lakehouse_spark.operators.dedup import (
        lsh_banding_efficiency,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
            (2, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
            (3, "completely unrelated text about spark plans here", "en", "s", 48),
        ],
        DOC_SCHEMA,
    )
    rows = {r["bands"]: r for r in lsh_banding_efficiency(docs).collect()}
    assert set(rows) == {1, 2, 4, 8}
    for b, r in rows.items():
        assert r["rows_per_band"] == 8 // b
        # the identical pair collides in EVERY band of every config
        assert r["est_candidate_pairs"] >= b
        assert r["n_buckets"] <= 3 * b
        assert r["n_hot_buckets"] == 0


def test_banding_efficiency_bounds_real_ladder(spark):
    from real_time_financial_lakehouse_spark.operators.dedup import (
        lsh_banding_efficiency,
        lsh_candidate_pairs,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = {r["bands"]: r for r in lsh_banding_efficiency(docs).collect()}
    # the production config's histogram estimate upper-bounds the
    # DISTINCT pair count the real ladder materializes (multiplicity
    # across bands only inflates the estimate)
    actual = lsh_candidate_pairs(docs).count()
    assert rows[4]["est_candidate_pairs"] >= actual
    for r in rows.values():
        assert r["avg_bucket_size"] >= 1.0


# ---------------------------------------------------------------------------
# implied_vol_newton
# ---------------------------------------------------------------------------


def test_implied_vol_recovers_planted_sigma(spark):
    rows = finance.implied_vol_newton(_events(spark)).collect()
    assert rows
    for r in rows:
        assert r["converged"] is True, r
        assert r["abs_vol_err"] == 0.0, r
        assert r["reprice_err"] == 0.0, r
        assert 0.15 <= r["sigma_true"] <= 0.5


def test_implied_vol_quote_matches_erf_pricer(spark):
    # independent referee: exact-normal (math.erf) Black-Scholes at the
    # planted vol must match the A-S-polynomial quote to the polynomial's
    # published 7.5e-8 CDF error (price error ~ spot * 1.5e-7)
    rows = finance.implied_vol_newton(_events(spark)).collect()
    pdf = (
        _events(spark)
        .toPandas()
        .query("value > 0")
        .sort_values(["ts", "event_id"])
    )
    rate, t = 0.02, 30.0 / 365.0
    for r in rows:
        g = pdf[pdf.event_type == r["symbol"]]
        spot = float(g.iloc[-1]["value"])
        strike = max(math.floor(spot + 0.5), 1.0)
        sig = r["sigma_true"]
        d1 = (math.log(spot / strike) + (rate + sig * sig / 2) * t) / (
            sig * math.sqrt(t)
        )
        d2 = d1 - sig * math.sqrt(t)
        nd = lambda x: 0.5 * (1 + math.erf(x / math.sqrt(2)))  # noqa: E731
        px = spot * nd(d1) - strike * math.exp(-rate * t) * nd(d2)
        assert r["target_px"] == pytest.approx(px, abs=max(1e-5, spot * 5e-7))


def test_implied_vol_sub_half_spot_never_fakes_convergence(spark):
    # r10 advisor finding: spot < 0.5 used to floor to strike=0, making
    # ln(spot/strike) infinite -- price collapsed to spot for EVERY
    # sigma, vega pinned at the 1e-8 guard, and the no-op Newton chain
    # reported converged=True at the 0.5 seed.  With the strike clamped
    # to >= 1, a sub-0.5 spot is a deep-OTM call whose quantized quote
    # is 0 and the row is filtered out; at-the-money symbols still solve.
    rows = [
        (1, dt.datetime(2024, 1, 1, 12), 1, "penny", 0.3, None),
        (2, dt.datetime(2024, 1, 2, 12), 1, "penny", 0.2, None),
        (3, dt.datetime(2024, 1, 1, 12), 1, "liquid", 50.0, None),
        (4, dt.datetime(2024, 1, 2, 12), 1, "liquid", 52.0, None),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    got = {r["symbol"]: r for r in finance.implied_vol_newton(df).collect()}
    assert "penny" not in got  # dropped, not faked
    r = got["liquid"]
    assert r["converged"] is True
    assert r["abs_vol_err"] == 0.0
    assert math.isfinite(r["implied_vol"]) and 0.15 <= r["implied_vol"] <= 0.5


# ---------------------------------------------------------------------------
# streaming_kmv_distinct
# ---------------------------------------------------------------------------


def test_streaming_kmv_equals_python_bottom_k(spark):
    from real_time_financial_lakehouse_spark.streaming.silver import (
        streaming_kmv_distinct,
    )

    rows = {
        r["event_type"]: r
        for r in streaming_kmv_distinct(spark, SF_SMOKE).collect()
    }
    pdf = _events(spark).toPandas()
    for grp, g in pdf.groupby("event_type"):
        hs = sorted(
            {
                int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15], 16)
                for u in g["user_id"]
            }
        )
        kept = hs[:32]
        r = rows[grp]
        assert r["n_kept"] == len(kept)
        if len(kept) < 32:
            assert r["kmv_estimate"] == float(len(kept))
        else:
            est = 31.0 * 1152921504606846976.0 / kept[-1]
            assert r["kmv_estimate"] == pytest.approx(_qr(est, 4), abs=1e-3)


# ---------------------------------------------------------------------------
# quality_filter_funnel
# ---------------------------------------------------------------------------


def test_quality_funnel_consistent_with_gate(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = {r["stage"]: r for r in text.quality_filter_funnel(docs).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    # survivors monotone nonincreasing, drops account exactly
    for i in range(1, 5):
        assert rows[i]["n_surviving"] <= rows[i - 1]["n_surviving"]
        assert (
            rows[i]["n_dropped_here"]
            == rows[i - 1]["n_surviving"] - rows[i]["n_surviving"]
        )
    gate = text.quality_gate(docs).collect()
    assert rows[0]["n_surviving"] == len(gate)
    assert rows[4]["n_surviving"] == sum(1 for g in gate if g["keep"])
    assert rows[0]["pct_of_corpus"] == 1.0


# ---------------------------------------------------------------------------
# packing_efficiency_sweep
# ---------------------------------------------------------------------------


def test_packing_sweep_invariants(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = {r["budget"]: r for r in pipeline.packing_efficiency_sweep(docs).collect()}
    assert set(rows) == {128, 256, 512, 1024}
    tokens = {r["total_tokens"] for r in rows.values()}
    assert len(tokens) == 1  # same corpus token mass at every budget
    budgets = sorted(rows)
    for lo, hi in zip(budgets, budgets[1:]):
        assert rows[hi]["n_sequences"] <= rows[lo]["n_sequences"]
    # consistency with the registered packer at its default budget
    packed = pipeline.pack_sequences(docs, budget=256)
    n_seq = packed.select("bucket", "seq_id").distinct().count()
    assert rows[256]["n_sequences"] == n_seq
    for r in rows.values():
        assert 0.0 <= r["pad_fraction"] <= 1.0
        assert r["avg_fill"] > 0
