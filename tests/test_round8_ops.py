"""Round-8 operator referees: money-flow / trend indicators, portfolio
math, Black-Scholes greeks, and the EWMA / Kalman recursive-state family.

Each test checks SEMANTICS independently of the DuckDB oracle (which
only proves both engines execute the same fold): numpy re-derivations
for the recursions, analytic identities for the portfolio and greeks.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from conftest import SF_SMOKE
from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators import finance


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_mfi_bounded_and_null_prefix(spark):
    rows = finance.mfi(_events(spark), n=14).collect()
    assert rows, "mfi returned nothing"
    by_sym: dict[str, list] = {}
    for r in rows:
        by_sym.setdefault(r["symbol"], []).append(r)
    for sym, rs in by_sym.items():
        # first 13 bars of each symbol can never have a full window
        for r in rs[:13]:
            assert r["mfi"] is None, f"{sym} early bar has MFI"
        vals = [r["mfi"] for r in rs if r["mfi"] is not None]
        assert vals, f"{sym} emitted no MFI at all"
        assert all(0.0 <= v <= 100.0 for v in vals)


def test_mfi_known_series(spark):
    """Planted bars: strictly rising typical price -> all flow positive
    -> MFI = 100; strictly falling -> MFI = 0."""
    data = []
    eid = 0
    for sym, step in (("up", 1.0), ("down", -1.0)):
        price = 100.0
        for m in range(20):
            price += step
            data.append(
                (eid, dt.datetime(2024, 1, 1, 0, m), 1, sym, price, '{"k": 2.0}')
            )
            eid += 1
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r["symbol"], r["minute_window"].minute): r["mfi"]
        for r in finance.mfi(ev, n=14).collect()
        if r["mfi"] is not None
    }
    assert out, "no full windows"
    assert all(v == 100.0 for (s, _), v in out.items() if s == "up")
    assert all(v == 0.0 for (s, _), v in out.items() if s == "down")


def test_aroon_bounds_and_oscillator_identity(spark):
    rows = finance.aroon(_events(spark), n=10).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["aroon_up"] <= 100.0
        assert 0.0 <= r["aroon_down"] <= 100.0
        assert r["aroon_osc"] == pytest.approx(
            r["aroon_up"] - r["aroon_down"], abs=2e-6
        )


def test_aroon_fresh_high_reads_100(spark):
    """A monotonically rising series: every bar is the freshest high
    (aroon_up = 100) and the window's low is always the oldest bar
    (aroon_down = 0)."""
    data = [
        (i, dt.datetime(2024, 1, 1 + i), 1, "mono", 100.0 + i, "{}")
        for i in range(15)
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = finance.aroon(ev, n=10).collect()
    assert len(rows) == 5  # days 11..15 have full 11-bar windows
    for r in rows:
        assert r["aroon_up"] == 100.0
        assert r["aroon_down"] == 0.0


def test_min_variance_portfolio_identities(spark):
    rows = finance.min_variance_portfolio(_events(spark)).collect()
    assert rows
    for r in rows:
        if r["w1"] is None:
            continue
        assert r["w1"] + r["w2"] == pytest.approx(1.0, abs=2e-6)
        # the unconstrained min-variance portfolio is never riskier than
        # holding either asset alone
        assert r["port_vol_annual"] <= min(r["vol1_annual"], r["vol2_annual"]) + 1e-4
        if r["corr"] is not None:
            assert -1.0 - 1e-6 <= r["corr"] <= 1.0 + 1e-6


def test_bs_greeks_against_exact_normal(spark):
    """Recompute every greek with math.erf's exact normal CDF from the
    emitted spot/strike/sigma; the A&S polynomial error is < 7.5e-8, so 1e-4
    absolute agreement proves the formulas, not just the fold."""
    rate, t = 0.02, 30.0 / 365.0
    inv_sqrt_2pi = 0.3989422804014327

    def cdf(x):
        return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))

    rows = finance.bs_greeks(_events(spark)).collect()
    assert rows
    for r in rows:
        s, k, sig = r["spot"], r["strike"], r["sigma_annual"]
        if sig is None or sig <= 0:
            continue
        d1 = (math.log(s / k) + (rate + sig * sig / 2.0) * t) / (sig * math.sqrt(t))
        d2 = d1 - sig * math.sqrt(t)
        pdf1 = inv_sqrt_2pi * math.exp(-d1 * d1 / 2.0)
        assert r["delta_call"] == pytest.approx(cdf(d1), abs=1e-4)
        assert r["delta_put"] == pytest.approx(cdf(d1) - 1.0, abs=1e-4)
        assert r["gamma"] == pytest.approx(pdf1 / (s * sig * math.sqrt(t)), abs=1e-4)
        assert r["vega"] == pytest.approx(s * pdf1 * math.sqrt(t), abs=1e-3)
        assert r["theta_call"] == pytest.approx(
            -(s * pdf1 * sig) / (2.0 * math.sqrt(t))
            - rate * k * math.exp(-rate * t) * cdf(d2),
            abs=1e-3,
        )
        assert r["rho_call"] == pytest.approx(
            k * t * math.exp(-rate * t) * cdf(d2), abs=1e-3
        )
        # sanity: call delta in (0,1), gamma/vega positive
        assert 0.0 < r["delta_call"] < 1.0
        assert r["gamma"] > 0 and r["vega"] > 0


def test_keltner_band_geometry(spark):
    rows = finance.keltner_channels(_events(spark)).collect()
    assert rows
    for r in rows:
        assert r["kc_upper"] >= r["kc_mid"] >= r["kc_lower"]
        # bands are symmetric around the mid
        assert (r["kc_upper"] - r["kc_mid"]) == pytest.approx(
            r["kc_mid"] - r["kc_lower"], abs=3e-6
        )


def test_ewma_riskmetrics_matches_numpy(spark):
    import numpy as np

    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    out = {r["symbol"]: r for r in finance.ewma_riskmetrics_vol(_events(spark)).collect()}
    assert out
    for sym, r in out.items():
        g = ev[(ev.event_type == sym) & (ev.value > 0)].copy()
        g["day"] = g.ts.dt.floor("D")
        closes = (
            g.sort_values(["ts", "event_id"]).groupby("day")["value"].last().sort_index()
        )
        rets = np.log(closes.values[1:] / closes.values[:-1])
        assert len(rets) == r["n_rets"]
        var = rets[0] * rets[0]
        for x in rets[1:]:
            var = 0.94 * var + 0.06 * (x * x)
        assert r["ewma_vol_daily"] == pytest.approx(math.sqrt(var), abs=1e-5)
        assert r["ewma_vol_annual"] == pytest.approx(math.sqrt(var * 252.0), abs=1e-5)


def test_kalman_matches_numpy_and_converges(spark):
    import numpy as np

    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    out = {r["symbol"]: r for r in finance.kalman_price_smooth(_events(spark)).collect()}
    assert out
    q_n, r_n = 0.001, 0.01
    for sym, r in out.items():
        g = ev[ev.event_type == sym].copy()
        g["day"] = g.ts.dt.floor("D")
        closes = (
            g.sort_values(["ts", "event_id"]).groupby("day")["value"].last().sort_index()
        ).values
        assert len(closes) == r["n_days"]
        x, p = closes[0], 1.0
        k = 0.0
        for z in closes[1:]:
            pp = p + q_n
            k = pp / (pp + r_n)
            x = x + k * (z - x)
            p = (1.0 - k) * pp
        assert r["kalman_level"] == pytest.approx(x, abs=1e-5)
        assert r["error_cov"] == pytest.approx(p, abs=1e-6)
        assert r["kalman_gain"] == pytest.approx(k, abs=1e-6)
        # steady-state gain of the fixed (q, r) model: p* solves the
        # Riccati fixed point; with q=0.001, r=0.01 -> k* ~ 0.27
        assert 0.0 < r["kalman_gain"] < 1.0
        assert min(closes) - 1e-9 <= r["kalman_level"] <= max(closes) + 1e-9


def test_readability_known_doc(spark):
    """One planted doc: 'the cat sat. a dog ran!' -> 6 words, 6
    syllables (every word 1 vowel group), 2 sentences -> wps = 3,
    spw = 1 -> flesch = 206.835 - 3.045 - 84.6 = 119.19."""
    from real_time_financial_lakehouse_spark.operators.text import readability_scores

    docs = spark.createDataFrame(
        [(1, "the cat sat. a dog ran!", "en", "s1", 23)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = readability_scores(docs).collect()[0]
    assert r["n_docs"] == 1
    assert r["avg_words_per_sentence"] == pytest.approx(3.0, abs=1e-6)
    assert r["avg_syllables_per_word"] == pytest.approx(1.0, abs=1e-6)
    assert r["avg_flesch"] == pytest.approx(119.19, abs=1e-4)
    assert r["avg_fk_grade"] == pytest.approx(0.39 * 3 + 11.8 - 15.59, abs=1e-4)
    assert r["readable_share"] == 1.0


def test_readability_empty_doc_is_null_safe(spark):
    from real_time_financial_lakehouse_spark.operators.text import readability_scores

    docs = spark.createDataFrame(
        [(1, "!!! ???", "en", "s1", 7), (2, "one two three.", "en", "s1", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = readability_scores(docs).collect()[0]
    # wordless doc contributes to n_docs and counts as unreadable, but
    # not to the syllable/flesch averages
    assert r["n_docs"] == 2
    assert r["avg_syllables_per_word"] is not None
    assert r["readable_share"] == 0.5


def test_matryoshka_monotone_and_full_width_ceiling(spark):
    from real_time_financial_lakehouse_spark.operators.similarity import (
        matryoshka_truncation_report,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = {r["d"]: r for r in matryoshka_truncation_report(emb).collect()}
    assert set(rows) == {8, 16, 32, 64}
    # energy retained grows with the prefix and hits exactly 1 at full width
    es = [rows[d]["energy_retained"] for d in (8, 16, 32, 64)]
    assert es == sorted(es)
    assert es[-1] == pytest.approx(1.0, abs=1e-6)
    for r in rows.values():
        assert 0.0 <= r["energy_retained"] <= 1.0 + 1e-9
        assert -1.0 - 1e-6 <= r["centroid_align"] <= 1.0 + 1e-6
        assert r["n_vectors"] == emb.count()


def test_matryoshka_plan_broadcasts_centroids(spark):
    """The corpus side must never shuffle for the centroid join --
    centroids are label x d cardinality and ride a broadcast."""
    from real_time_financial_lakehouse_spark.operators.similarity import (
        matryoshka_truncation_report,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = (
        matryoshka_truncation_report(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
