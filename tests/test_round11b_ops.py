"""Semantics referees for the round-11 batch-2 additions (runs test,
realized kernel, CDaR): planted analytic cases with hand-computable
answers plus numpy/pandas re-derivations on the fixture."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from conftest import SF_SMOKE
from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators import finance

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def _qr(x: float, d: int = 6) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _tick_frame(spark, closes, symbol="sym"):
    rows = [
        (
            i + 1,
            dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=12),
            1,
            symbol,
            float(c),
            None,
        )
        for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _daily_lr(pdf, symbol):
    import numpy as np

    g = pdf[pdf.event_type == symbol]
    closes = g.groupby("day").last()["value"].sort_index()
    lr = np.log(closes / closes.shift(1)).dropna().to_numpy()
    return np.floor(lr * 1e12 + 0.5) / 1e12


def _fixture_pdf(spark):
    return (
        _events(spark)
        .toPandas()
        .query("value > 0")
        .sort_values(["ts", "event_id"])
        .assign(day=lambda d: d["ts"].dt.floor("D"))
    )


# ---------------------------------------------------------------------------
# runs_test_randomness
# ---------------------------------------------------------------------------


def test_runs_test_alternating_signs_maximal_runs(spark):
    # +1%/-1% alternation over 41 closes: 40 returns, signs alternate,
    # so every return starts a new run: R = 40, n1 = n2 = 20.
    closes, c = [100.0], 100.0
    for i in range(40):
        c *= 1.01 if i % 2 == 0 else 1 / 1.01
        closes.append(c)
    rows = finance.runs_test_randomness(_tick_frame(spark, closes)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_days"], r["n_pos"], r["n_neg"], r["n_runs"]) == (40, 20, 20, 40)
    mu = 2.0 * 20 * 20 / 40 + 1.0  # 21
    var = 2.0 * 20 * 20 * (2.0 * 20 * 20 - 40) / (40.0 * 40.0 * 39.0)
    assert r["expected_runs"] == pytest.approx(mu, abs=1e-9)
    assert r["z_stat"] == pytest.approx(_qr((40 - mu) / math.sqrt(var), 6), abs=1e-9)
    assert r["z_stat"] > 1.96 and r["reject_5pct"] is True


def test_runs_test_single_trend_reversal_two_runs(spark):
    # 20 up-days then 20 down-days: exactly 2 runs -> far too few.
    closes = [100.0 * (1.01**i) for i in range(21)]
    closes += [closes[-1] * (0.99 ** (i + 1)) for i in range(20)]
    rows = finance.runs_test_randomness(_tick_frame(spark, closes)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_pos"], r["n_neg"], r["n_runs"]) == (20, 20, 2)
    assert r["z_stat"] < -1.96 and r["reject_5pct"] is True


def test_runs_test_matches_numpy_on_fixture(spark):
    import numpy as np

    rows = finance.runs_test_randomness(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    for r in rows:
        lr = _daily_lr(pdf, r["symbol"])
        s = np.sign(lr[lr != 0]).astype(int)
        n1, n2 = int((s == 1).sum()), int((s == -1).sum())
        runs = int(1 + (s[1:] != s[:-1]).sum())
        n = n1 + n2
        assert (r["n_days"], r["n_pos"], r["n_neg"], r["n_runs"]) == (
            n,
            n1,
            n2,
            runs,
        )
        mu = 2.0 * n1 * n2 / n + 1.0
        var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
        assert r["expected_runs"] == pytest.approx(_qr(mu, 6), abs=1e-9)
        assert r["z_stat"] == pytest.approx(
            _qr((runs - mu) / math.sqrt(var), 6), abs=1e-9
        )


# ---------------------------------------------------------------------------
# realized_kernel_vol
# ---------------------------------------------------------------------------


def test_parzen_weights_closed_form():
    w = finance._parzen_weights(5)
    # k(x) = 1 - 6x^2 + 6x^3 for x <= 1/2, 2(1-x)^3 above; x = h/6
    assert w[0] == pytest.approx(1 - 6 / 36 + 6 / 216)
    assert w[2] == pytest.approx(0.25)
    assert w[4] == pytest.approx(2 * (1 / 6) ** 3)
    assert all(w[i] > w[i + 1] for i in range(4))  # monotone decay


def test_realized_kernel_alternating_noise_shrinks_variance(spark):
    # bid-ask-bounce caricature: alternating +-1% returns have strongly
    # negative lag-1 autocovariance, so RK << RV (kernel_ratio near 0).
    closes, c = [100.0], 100.0
    for i in range(60):
        c *= 1.01 if i % 2 == 0 else 1 / 1.01
        closes.append(c)
    rows = finance.realized_kernel_vol(_tick_frame(spark, closes)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rv"] > 0
    assert r["kernel_ratio"] < 0.5
    assert r["rk_variance"] < r["rv"]


def test_realized_kernel_matches_numpy_on_fixture(spark):
    import numpy as np

    rows = finance.realized_kernel_vol(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    weights = finance._parzen_weights(5)
    for r in rows:
        lr = _daily_lr(pdf, r["symbol"])
        n = len(lr)
        assert r["n_days"] == n
        g0 = float(np.sum(np.floor(lr * lr * 1e12 + 0.5)))
        rk = g0
        for h in range(1, 6):
            gh = float(np.sum(np.floor(lr[h:] * lr[:-h] * 1e12 + 0.5)))
            rk += 2.0 * weights[h - 1] * gh
        rv_raw = g0 / 1e12
        rk_q = _qr(rk / 1e12, 12)
        assert r["rv"] == pytest.approx(_qr(rv_raw, 10), abs=1e-12)
        assert r["rk_variance"] == pytest.approx(_qr(rk_q, 10), abs=1e-12)
        assert r["kernel_ratio"] == pytest.approx(_qr(rk_q / rv_raw, 6), abs=1e-9)
        ann = math.sqrt(_qr(max(rk_q, 0.0) * 252.0 / n, 12))
        assert r["rk_vol_annualized"] == pytest.approx(_qr(ann, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# cdar_conditional_drawdown
# ---------------------------------------------------------------------------


def test_cdar_planted_two_dips(spark):
    # 30 days at 100 except day 10 (80 -> depth 0.2) and day 11
    # (90 -> depth 0.1); k = ceil(30 * 0.05) = 2 worst depths.
    closes = [100.0] * 30
    closes[10], closes[11] = 80.0, 90.0
    rows = finance.cdar_conditional_drawdown(
        _tick_frame(spark, closes)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_days"], r["k_tail"]) == (30, 2)
    assert r["max_drawdown"] == pytest.approx(0.2, abs=1e-9)
    assert r["cdar"] == pytest.approx(0.15, abs=1e-9)


def test_cdar_monotone_rally_is_zero(spark):
    closes = [100.0 * (1.005**i) for i in range(25)]
    rows = finance.cdar_conditional_drawdown(
        _tick_frame(spark, closes)
    ).collect()
    assert len(rows) == 1
    assert rows[0]["max_drawdown"] == 0.0
    assert rows[0]["cdar"] == 0.0


def test_cdar_matches_numpy_on_fixture(spark):
    import numpy as np

    rows = finance.cdar_conditional_drawdown(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    for r in rows:
        g = pdf[pdf.event_type == r["symbol"]]
        closes = g.groupby("day").last()["value"].sort_index().to_numpy()
        runmax = np.maximum.accumulate(closes)
        dd = np.floor((1.0 - closes / runmax) * 1e12 + 0.5) / 1e12
        dd_u = np.floor(dd * 1e12 + 0.5).astype(np.int64)
        n = len(dd_u)
        k = math.ceil(n * 0.05)
        worst = np.sort(dd_u)[::-1][:k]
        assert (r["n_days"], r["k_tail"]) == (n, k)
        assert r["max_drawdown"] == pytest.approx(
            _qr(float(worst.max()) / 1e12, 6), abs=1e-12
        )
        assert r["cdar"] == pytest.approx(
            _qr(float(worst.sum()) / k / 1e12, 6), abs=1e-12
        )
        # CDaR dominates no statistic it shouldn't: max >= cdar >= 0
        assert r["max_drawdown"] >= r["cdar"] >= 0.0


# ---------------------------------------------------------------------------
# js_divergence_drift
# ---------------------------------------------------------------------------

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _half_split_frame(spark, first_vals, second_vals, symbol="sym"):
    rows = []
    for i, v in enumerate(first_vals):
        rows.append(
            (i + 1, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), 1, symbol, float(v), None)
        )
    base = dt.datetime(2024, 3, 1)
    for i, v in enumerate(second_vals):
        rows.append(
            (1000 + i, base + dt.timedelta(hours=i), 1, symbol, float(v), None)
        )
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_jsd_identical_halves_is_zero(spark):
    from real_time_financial_lakehouse_spark.operators.profiling import (
        js_divergence_drift,
    )

    vals = [float(i) for i in range(20)]
    rows = js_divergence_drift(_half_split_frame(spark, vals, vals)).collect()
    assert len(rows) == 1
    r = rows[0]
    # equal per-bin counts -> p == q exactly -> every contribution 0
    assert r["jsd"] == 0.0
    assert r["jsd_normalized"] == 0.0
    assert r["drift_alert"] is False


def test_jsd_disjoint_halves_near_ln2(spark):
    from real_time_financial_lakehouse_spark.operators.profiling import (
        js_divergence_drift,
    )

    rows = js_divergence_drift(
        _half_split_frame(spark, [0.0] * 30, [100.0] * 30)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["jsd_normalized"] > 0.5
    assert r["drift_alert"] is True
    # bounded: JSD can never exceed ln 2
    assert r["jsd"] <= math.log(2.0) + 1e-9


def test_jsd_matches_numpy_on_fixture(spark):
    import numpy as np

    from real_time_financial_lakehouse_spark.operators.profiling import (
        js_divergence_drift,
    )

    rows = js_divergence_drift(_events(spark)).collect()
    assert rows
    pdf = _events(spark).toPandas().dropna(subset=["value"])
    us = pdf["ts"].astype("int64") // 1000
    mid = (us.min() + us.max()) // 2
    vmin, vmax = pdf["value"].min(), pdf["value"].max()
    bins = np.minimum(
        np.floor((pdf["value"] - vmin) / (vmax - vmin) * 10), 9
    ).astype(int)
    for r in rows:
        mask = (pdf["event_type"] == r["symbol"]).to_numpy()
        cur = (us > mid).to_numpy()[mask]
        b = bins.to_numpy()[mask]
        total = 0.0
        n_ref_t = int((~cur).sum())
        n_cur_t = int(cur.sum())
        # round-12: the engine materializes the FULL 10-bin grid, so
        # bins empty in both halves still carry their +0.5 Laplace mass
        for bin_id in range(10):
            n_ref = int(((b == bin_id) & ~cur).sum())
            n_cur = int(((b == bin_id) & cur).sum())
            p = (n_ref + 0.5) / (n_ref_t + 5.0)
            q = (n_cur + 0.5) / (n_cur_t + 5.0)
            m = (p + q) / 2.0
            lp = _qr(math.log(p / m), 12)
            lq = _qr(math.log(q / m), 12)
            total += math.floor(0.5 * (p * lp + q * lq) * 1e12 + 0.5)
        assert (r["n_ref"], r["n_cur"]) == (n_ref_t, n_cur_t)
        assert r["jsd"] == pytest.approx(_qr(total / 1e12, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# t_closeness_report
# ---------------------------------------------------------------------------


def test_t_closeness_identical_groups_zero_emd(spark):
    from real_time_financial_lakehouse_spark.operators.pipeline import (
        t_closeness_report,
    )

    rows = []
    for g, (lang, src) in enumerate([("en", "web"), ("en", "books")]):
        for i in range(10):
            rows.append((g * 100 + i, "x", lang, src, 10 * i))
    out = t_closeness_report(
        spark.createDataFrame(rows, DOC_SCHEMA)
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["emd"] == 0.0
        assert r["t_violation"] is False


def test_t_closeness_polarized_groups_emd_half(spark):
    from real_time_financial_lakehouse_spark.operators.pipeline import (
        t_closeness_report,
    )

    # group A all at the min bucket, group B all at the max: each group's
    # cumulative share differs from the global by 0.5 in 9 of 10 buckets
    rows = [(i, "x", "en", "short", 0) for i in range(10)]
    rows += [(100 + i, "x", "en", "long", 99) for i in range(10)]
    out = t_closeness_report(
        spark.createDataFrame(rows, DOC_SCHEMA)
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["emd"] == pytest.approx(0.5, abs=1e-9)
        assert r["t_violation"] is True


def test_t_closeness_matches_pandas_on_fixture(spark):
    import numpy as np

    from real_time_financial_lakehouse_spark.catalog import load_table
    from real_time_financial_lakehouse_spark.operators.pipeline import (
        t_closeness_report,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = t_closeness_report(docs).collect()
    assert rows
    pdf = docs.toPandas().dropna(subset=["n_chars"])
    cmin, cmax = pdf["n_chars"].min(), pdf["n_chars"].max()
    pdf["bucket"] = np.minimum(
        np.floor((pdf["n_chars"] - cmin) / (cmax - cmin) * 10), 9
    ).astype(int)
    t_all = len(pdf)
    gcounts = pdf["bucket"].value_counts().reindex(range(10), fill_value=0)
    gcum = gcounts.sort_index().cumsum().to_numpy()
    for r in rows:
        g = pdf[(pdf["lang"] == r["lang"]) & (pdf["source"] == r["source"])]
        counts = g["bucket"].value_counts().reindex(range(10), fill_value=0)
        cum = counts.sort_index().cumsum().to_numpy()
        t_g = len(g)
        term = np.abs(cum * t_all - gcum * t_g).sum()
        emd = float(term) / (t_g * t_all) / 9.0
        assert r["n_docs"] == t_g
        assert r["emd"] == pytest.approx(_qr(emd, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# dedup_precision_recall_audit
# ---------------------------------------------------------------------------


def _audit_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)], DOC_SCHEMA
    )


def test_dedup_audit_exact_copies_perfect_scores(spark):
    from real_time_financial_lakehouse_spark.operators.dedup import (
        dedup_precision_recall_audit,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "a completely different document about sparkling distributed joins"
    docs = _audit_docs(spark, [base, base, base, other, other])
    r = dedup_precision_recall_audit(docs).collect()[0]
    # 3 exact copies -> C(3,2)=3 truth pairs; 2 copies -> 1 more
    assert r["n_truth_pairs"] == 4
    # identical raw text => identical signatures => all truth pairs found
    assert r["tp"] == 4 and r["fn"] == 0
    assert r["recall"] == 1.0
    assert r["precision"] == 1.0 and r["fp"] == 0


def test_dedup_audit_normalization_variants_lower_recall(spark):
    from real_time_financial_lakehouse_spark.operators.dedup import (
        dedup_precision_recall_audit,
    )

    exact = "pack my box with five dozen liquor jugs tonight"
    docs = _audit_docs(
        spark,
        [
            exact,
            exact,
            "some other words entirely for this document here",
            "  SOME OTHER   WORDS entirely FOR this document HERE ",
        ],
    )
    r = dedup_precision_recall_audit(docs).collect()[0]
    # both pairs are TRUTH (normalized-equal), but the case/whitespace
    # variant has different raw shingles, so LSH finds only the exact one
    assert r["n_truth_pairs"] == 2
    assert r["tp"] == 1 and r["fn"] == 1
    assert r["recall"] == pytest.approx(0.5)
    assert r["precision"] == 1.0
    assert r["f1"] == pytest.approx(_qr(2 * 1.0 * 0.5 / 1.5, 6), abs=1e-9)


def test_dedup_audit_consistent_with_candidate_generator(spark):
    from real_time_financial_lakehouse_spark.operators.dedup import (
        dedup_precision_recall_audit,
        lsh_candidate_pairs,
    )

    docs = load_table(spark, SF_SMOKE, "documents").filter("text IS NOT NULL")
    r = dedup_precision_recall_audit(docs).collect()[0]
    assert r["n_pred_pairs"] == lsh_candidate_pairs(docs).count()
    assert r["tp"] + r["fp"] == r["n_pred_pairs"]
    assert r["tp"] + r["fn"] == r["n_truth_pairs"]
    assert r["n_docs"] == docs.count()


# ---------------------------------------------------------------------------
# code_prose_classifier
# ---------------------------------------------------------------------------


def test_code_prose_planted_split(spark):
    from real_time_financial_lakehouse_spark.operators.text import (
        code_prose_classifier,
    )

    code = "def f(x):\n    y = (x + 1);\n    return {y: [x]}\n"
    prose = "this is a plain sentence about nothing much at all today"
    rows = [(1, code, "en", "repo", len(code)), (2, prose, "en", "web", len(prose))]
    out = {
        r["source"]: r
        for r in code_prose_classifier(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    assert out["repo"]["n_code"] == 1 and out["repo"]["code_ratio"] == 1.0
    assert out["web"]["n_code"] == 0 and out["web"]["code_ratio"] == 0.0
    assert out["repo"]["sym_per_100_chars"] > out["web"]["sym_per_100_chars"]
    assert out["repo"]["indent_line_share"] > 0


def test_code_prose_matches_re_on_fixture(spark):
    import re

    from real_time_financial_lakehouse_spark.catalog import load_table as _lt
    from real_time_financial_lakehouse_spark.operators.text import (
        code_prose_classifier,
    )

    docs = _lt(spark, SF_SMOKE, "documents")
    rows = code_prose_classifier(docs).collect()
    assert rows
    pdf = docs.toPandas()
    sym_re = re.compile(r"[{}()\[\];=<>#]")
    ind_re = re.compile(r"^[ \t]", re.M)
    for r in rows:
        g = pdf[pdf["source"] == r["source"]]
        n_code = sum_sym = sum_chars = sum_ind = sum_lines = 0
        for t in g["text"].fillna(""):
            ns, nc = len(sym_re.findall(t)), len(t)
            nl, ni = t.count("\n") + 1, len(ind_re.findall(t))
            sum_sym += ns
            sum_chars += nc
            sum_ind += ni
            sum_lines += nl
            n_code += int(ns * 50 > nc or ni * 3 > nl)
        assert r["n_docs"] == len(g)
        assert r["n_code"] == n_code
        assert r["code_ratio"] == pytest.approx(_qr(n_code / len(g), 6), abs=1e-9)
        if sum_chars:
            assert r["sym_per_100_chars"] == pytest.approx(
                _qr(sum_sym * 100.0 / sum_chars, 6), abs=1e-9
            )


# ---------------------------------------------------------------------------
# treynor_information_ratios
# ---------------------------------------------------------------------------


def test_treynor_single_symbol_is_market(spark):
    # one symbol: the market IS the symbol, so beta = 1, active = 0,
    # tracking error = 0, IR undefined (NULL)
    import random

    rnd = random.Random(7)
    closes, c = [], 100.0
    for _ in range(40):
        c *= 1.0 + rnd.uniform(-0.02, 0.02)
        closes.append(c)
    rows = finance.treynor_information_ratios(
        _tick_frame(spark, closes)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["beta"] == pytest.approx(1.0, abs=1e-6)
    assert r["tracking_error"] == 0.0
    assert r["info_ratio_ann"] is None
    assert r["treynor_ann"] is not None


def test_treynor_levered_symbol_beta_ratio(spark):
    # symbol B's log returns are exactly 2x symbol A's: with the
    # equal-weight market m = 1.5x, beta_A = 2/3 and beta_B = 4/3
    import math as m

    steps = [0.01, -0.005, 0.02, -0.01, 0.015, -0.02, 0.005] * 5
    rows = []
    ca = cb = 100.0
    for i, s in enumerate(steps):
        ca *= m.exp(s)
        cb *= m.exp(2 * s)
        ts = dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i)
        rows.append((2 * i + 1, ts, 1, "alpha", ca, None))
        rows.append((2 * i + 2, ts, 1, "bravo", cb, None))
    out = {
        r["symbol"]: r
        for r in finance.treynor_information_ratios(
            spark.createDataFrame(rows, EVENT_SCHEMA)
        ).collect()
    }
    assert out["alpha"]["beta"] == pytest.approx(2 / 3, abs=1e-4)
    assert out["bravo"]["beta"] == pytest.approx(4 / 3, abs=1e-4)


def test_treynor_matches_numpy_on_fixture(spark):
    import numpy as np

    rows = finance.treynor_information_ratios(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    # rebuild the (symbol, day, lr) frame exactly as the ladder does
    series = {}
    for sym in pdf.event_type.unique():
        lr = _daily_lr(pdf, sym)
        days = sorted(pdf[pdf.event_type == sym]["day"].unique())[1:]
        series[sym] = dict(zip(days, lr))
    all_days = sorted({d for s in series.values() for d in s})
    market = {
        d: _qr(
            float(np.mean([s[d] for s in series.values() if d in s])), 12
        )
        for d in all_days
    }
    for r in rows:
        s = series[r["symbol"]]
        rr = np.array([s[d] for d in sorted(s)])
        mm = np.array([market[d] for d in sorted(s)])
        active = rr - mm
        beta = float(np.cov(rr, mm, bias=True)[0, 1] / np.var(mm))
        assert r["n_days"] == len(rr)
        assert r["beta"] == pytest.approx(_qr(beta, 6), abs=1e-6)
        te = _qr(float(np.std(active)), 12)
        assert r["tracking_error"] == pytest.approx(_qr(te, 6), abs=1e-6)
        if te != 0:
            ma = _qr(float(np.mean(active)), 12)
            assert r["info_ratio_ann"] == pytest.approx(
                _qr(ma / te * finance._SQRT_252, 6), abs=1e-5
            )


# ---------------------------------------------------------------------------
# lee_ready_tick_classification
# ---------------------------------------------------------------------------


def _lr_tick_frame(spark, prices, qty=1.0, symbol="sym"):
    rows = [
        (
            i + 1,
            dt.datetime(2024, 1, 1, 9) + dt.timedelta(minutes=i),
            1,
            symbol,
            float(p),
            '{"k": %s}' % qty,
        )
        for i, p in enumerate(prices)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_lee_ready_planted_sequence(spark):
    # ticks: null,+1,0,-1,0,+1 -> carried sides: null,+1,+1,-1,-1,+1
    prices = [100, 101, 101, 100, 100, 102]
    rows = finance.lee_ready_tick_classification(
        _lr_tick_frame(spark, prices)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_trades"], r["n_buys"], r["n_sells"], r["n_unclassified"]) == (
        6,
        3,
        2,
        1,
    )
    assert r["buy_ratio"] == pytest.approx(0.6, abs=1e-9)
    # flow = +101 +101 -100 -100 +102 = +104
    assert r["dollar_flow_imbalance"] == pytest.approx(104.0, abs=1e-9)


def test_lee_ready_matches_pandas_on_fixture(spark):
    import numpy as np

    rows = finance.lee_ready_tick_classification(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    pdf = pdf.assign(
        qty=pdf["props"].apply(
            lambda p: __import__("json").loads(p).get("k") if p else None
        )
    )
    got = {(r["symbol"], r["day"].date()): r for r in rows}
    for sym in pdf.event_type.unique():
        g = pdf[pdf.event_type == sym].sort_values(["ts", "event_id"])
        d = g["value"].diff()
        tick = np.sign(d)
        side = tick.replace(0.0, np.nan).ffill()
        g = g.assign(side=side, day=g["ts"].dt.floor("D"))
        for day, gd in g.groupby("day"):
            r = got[(sym, day.date())]
            assert r["n_buys"] == int((gd["side"] == 1).sum())
            assert r["n_sells"] == int((gd["side"] == -1).sum())
            assert r["n_unclassified"] == int(gd["side"].isna().sum())
            flow = 0
            for _, row in gd.iterrows():
                if not np.isnan(row["side"]) and row["qty"] is not None:
                    flow += int(row["side"]) * math.floor(
                        row["value"] * float(row["qty"]) * 1e6 + 0.5
                    )
            assert r["dollar_flow_imbalance"] == pytest.approx(
                flow / 1e6, abs=1e-6
            )


# ---------------------------------------------------------------------------
# streaming_session_merge
# ---------------------------------------------------------------------------


def test_streaming_session_merge_equals_batch_sessionize(spark):
    from real_time_financial_lakehouse_spark.operators.windows import (
        sessionize,
    )
    from real_time_financial_lakehouse_spark.streaming.silver import (
        streaming_session_merge,
    )

    batch = sessionize(_events(spark)).collect()
    stream = streaming_session_merge(spark, SF_SMOKE).collect()
    assert len(stream) == len(batch) > 0
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))


def test_session_window_boundary_semantics_documented(spark):
    # session_window MERGES the exactly-touching case (gap == 30 stays
    # one session) -- the merge twin's islands rule uses strict > to
    # match; the shared oracle's >= split never fires on fixture
    # timestamps.  Away from the boundary: gap 31 splits, gap 29 chains.
    from real_time_financial_lakehouse_spark.operators.windows import (
        sessionize,
    )

    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, base, 7, "a", 1.0, None),
        (2, base + dt.timedelta(minutes=10), 7, "a", 1.0, None),
        (3, base + dt.timedelta(minutes=41), 7, "a", 1.0, None),  # gap 31
        (4, base + dt.timedelta(minutes=70), 7, "a", 1.0, None),  # gap 29
    ]
    out = sessionize(spark.createDataFrame(rows, EVENT_SCHEMA)).collect()
    assert sorted(r["n_events"] for r in out) == [2, 2]
    touching = [
        (1, base, 7, "a", 1.0, None),
        (2, base + dt.timedelta(minutes=30), 7, "a", 1.0, None),  # gap 30
    ]
    out2 = sessionize(spark.createDataFrame(touching, EVENT_SCHEMA)).collect()
    assert [r["n_events"] for r in out2] == [2]


# ---------------------------------------------------------------------------
# mode_per_user
# ---------------------------------------------------------------------------


def test_mode_per_user_deterministic_tiebreak(spark):
    from real_time_financial_lakehouse_spark.operators.rollup import (
        mode_per_user,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "zeta", 1.0, None),
        (2, base, 1, "zeta", 1.0, None),
        (3, base, 1, "alpha", 1.0, None),
        (4, base, 1, "alpha", 1.0, None),  # tie 2-2 -> alpha wins lexically
        (5, base, 2, "zeta", 1.0, None),
    ]
    out = {
        r["user_id"]: r
        for r in mode_per_user(
            spark.createDataFrame(rows, EVENT_SCHEMA)
        ).collect()
    }
    assert out[1]["mode_event_type"] == "alpha"
    assert out[1]["n_mode"] == 2 and out[1]["n_total"] == 4
    assert out[1]["mode_share"] == pytest.approx(0.5)
    assert out[2]["mode_event_type"] == "zeta" and out[2]["mode_share"] == 1.0


def test_mode_per_user_matches_pandas_on_fixture(spark):
    from real_time_financial_lakehouse_spark.operators.rollup import (
        mode_per_user,
    )

    rows = mode_per_user(_events(spark)).collect()
    assert rows
    pdf = _events(spark).toPandas()
    for r in rows[:50]:
        g = pdf[pdf["user_id"] == r["user_id"]]
        counts = g["event_type"].value_counts()
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (r["mode_event_type"], r["n_mode"], r["n_total"]) == (
            best[0],
            best[1],
            len(g),
        )


# ---------------------------------------------------------------------------
# trigram_interpolated_logprob
# ---------------------------------------------------------------------------


def _split_of(doc_id: int) -> str:
    import hashlib

    b = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16) % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


def test_trigram_lm_planted_micro_corpus(spark):
    from real_time_financial_lakehouse_spark.operators.text import (
        trigram_interpolated_logprob,
    )

    # pick concrete ids per split so the md5 split is under our control
    train_ids = [i for i in range(200) if _split_of(i) == "train"][:2]
    test_id = next(i for i in range(200) if _split_of(i) == "test")
    docs = [
        (train_ids[0], "a b c a b c a b c", "en", "s", 17),
        (train_ids[1], "a b d", "en", "s", 5),
        (test_id, "a b c x y z", "en", "s", 11),
    ]
    out = {
        r["split"]: r
        for r in trigram_interpolated_logprob(
            spark.createDataFrame(docs, DOC_SCHEMA)
        ).collect()
    }
    # python re-derivation with the same counts and lambdas
    train_tris = (
        [("a", "b", "c")] * 3
        + [("b", "c", "a"), ("c", "a", "b")] * 2
        + [("a", "b", "d")]  # the 3-token doc contributes one trigram
    )
    c3: dict = {}
    for t in train_tris:
        c3[t] = c3.get(t, 0) + 1
    c2ctx: dict = {}
    for t in train_tris:
        c2ctx[t[:2]] = c2ctx.get(t[:2], 0) + 1
    train_pairs = (
        [("a", "b")] * 3
        + [("b", "c")] * 3
        + [("c", "a")] * 2
        + [("a", "b")],
    )[0] + [("b", "d")]
    cp: dict = {}
    c1: dict = {}
    for p in train_pairs:
        cp[p] = cp.get(p, 0) + 1
        c1[p[0]] = c1.get(p[0], 0) + 1
    uni = {"a": 4, "b": 4, "c": 3, "d": 1}
    n_train, v_train = 12.0, 4.0

    def prob(w1, w2, w3):
        p3 = c3.get((w1, w2, w3), 0) / c2ctx[(w1, w2)] if (w1, w2) in c2ctx else 0.0
        p2 = cp.get((w2, w3), 0) / c1[w2] if w2 in c1 else 0.0
        p1 = (uni.get(w3, 0) + 1.0) / (n_train + v_train + 1.0)
        return 0.6 * p3 + 0.3 * p2 + 0.1 * p1

    test_tris = [("a", "b", "c"), ("b", "c", "x"), ("c", "x", "y"), ("x", "y", "z")]
    ce = -sum(math.log(prob(*t)) for t in test_tris) / len(test_tris)
    assert out["test"]["n_trigrams"] == 4
    assert out["test"]["cross_entropy"] == pytest.approx(_qr(ce, 6), abs=1e-6)
    assert out["test"]["hit3_rate"] == pytest.approx(0.25)
    assert out["test"]["hit2_rate"] == pytest.approx(0.25)
    assert out["train"]["hit3_rate"] == 1.0


def test_trigram_lm_fixture_invariants(spark):
    from real_time_financial_lakehouse_spark.catalog import load_table as _lt
    from real_time_financial_lakehouse_spark.operators.text import (
        trigram_interpolated_logprob,
    )

    out = {
        r["split"]: r
        for r in trigram_interpolated_logprob(
            _lt(spark, SF_SMOKE, "documents")
        ).collect()
    }
    assert set(out) == {"train", "val", "test"}
    # the model saw every train trigram: hit3 == 1 and train CE is lowest
    assert out["train"]["hit3_rate"] == 1.0
    assert out["train"]["cross_entropy"] < out["val"]["cross_entropy"]
    assert out["train"]["cross_entropy"] < out["test"]["cross_entropy"]
    for r in out.values():
        assert r["perplexity"] == pytest.approx(
            _qr(math.exp(r["cross_entropy"]), 4), abs=1e-4
        )


# ---------------------------------------------------------------------------
# garch_filter_vol
# ---------------------------------------------------------------------------


def test_garch_constant_magnitude_returns_ratio_one(spark):
    # alternating +-1%: every squared return equals the unconditional
    # variance, so the filter never leaves the long-run level
    closes, c = [100.0], 100.0
    for i in range(40):
        c *= 1.01 if i % 2 == 0 else 1 / 1.01
        closes.append(c)
    rows = finance.garch_filter_vol(_tick_frame(spark, closes)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["terminal_vol_ratio"] == pytest.approx(1.0, abs=0.02)
    assert r["n_high_vol_days"] == 0


def test_garch_terminal_spike_detected(spark):
    import random

    rnd = random.Random(3)
    closes, c = [], 100.0
    for _ in range(40):
        c *= 1.0 + rnd.uniform(-0.001, 0.001)
        closes.append(c)
    for i in range(8):
        c *= 1.06 if i % 2 == 0 else 1 / 1.06
        closes.append(c)
    rows = finance.garch_filter_vol(_tick_frame(spark, closes)).collect()
    r = rows[0]
    assert r["terminal_vol_ratio"] > 1.5
    assert r["n_high_vol_days"] >= 4


def test_garch_matches_python_fold_on_fixture(spark):
    import numpy as np

    rows = finance.garch_filter_vol(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    for r in rows:
        lr = _daily_lr(pdf, r["symbol"])
        n = len(lr)
        sum_u = float(np.sum(np.floor(lr * lr * 1e12 + 0.5)))
        vhat = sum_u / n / 1e12
        s2, hi = vhat, 0
        for x in lr:
            s2 = 0.02 * vhat + 0.08 * x * x + 0.9 * s2
            if s2 > 2.0 * vhat:
                hi += 1
        assert r["n_days"] == n
        assert r["uncond_vol_ann"] == pytest.approx(
            _qr(math.sqrt(_qr(vhat * 252.0, 12)), 6), abs=1e-9
        )
        assert r["garch_vol_ann"] == pytest.approx(
            _qr(math.sqrt(_qr(max(s2, 0.0) * 252.0, 12)), 6), abs=1e-9
        )
        assert r["n_high_vol_days"] == hi


# ---------------------------------------------------------------------------
# hayashi_yoshida_covariance
# ---------------------------------------------------------------------------


def test_hy_synchronous_identical_returns_corr_one(spark):
    # both symbols tick at the same instants with identical returns:
    # every interval pair overlaps itself only -> corr == 1 exactly
    rows = []
    c = 100.0
    for i in range(50):
        c *= 1.01 if i % 3 else 1 / 1.005
        ts = dt.datetime(2024, 1, 1, 9) + dt.timedelta(minutes=2 * i)
        rows.append((2 * i + 1, ts, 1, "aaa", c, None))
        rows.append((2 * i + 2, ts, 1, "bbb", 2 * c, None))
    out = finance.hayashi_yoshida_covariance(
        spark.createDataFrame(rows, EVENT_SCHEMA)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["hy_corr"] == 1.0
    assert r["n_overlap_pairs"] == 49


def test_hy_disjoint_sessions_have_no_pairs(spark):
    # all of B's return intervals start after A's last tick: no overlap
    rows = []
    for i in range(10):
        rows.append(
            (i + 1, dt.datetime(2024, 1, 1, 9) + dt.timedelta(minutes=i), 1, "aaa", 100.0 + i, None)
        )
    for i in range(10):
        rows.append(
            (100 + i, dt.datetime(2024, 1, 1, 15) + dt.timedelta(minutes=i), 1, "bbb", 50.0 + i, None)
        )
    out = finance.hayashi_yoshida_covariance(
        spark.createDataFrame(rows, EVENT_SCHEMA)
    ).collect()
    assert out == []


def test_hy_matches_bruteforce_on_planted_async_ticks(spark):
    import random

    import numpy as np

    rnd = random.Random(11)
    rows, ticks = [], {"aaa": [], "bbb": []}
    eid = 0
    t = dt.datetime(2024, 1, 1, 9)
    va, vb = 100.0, 200.0
    for _ in range(120):
        t += dt.timedelta(seconds=rnd.randint(5, 600))
        sym = "aaa" if rnd.random() < 0.5 else "bbb"
        if sym == "aaa":
            va *= 1.0 + rnd.uniform(-0.01, 0.01)
            v = va
        else:
            vb *= 1.0 + rnd.uniform(-0.01, 0.01)
            v = vb
        eid += 1
        rows.append((eid, t, 1, sym, v, None))
        ticks[sym].append((t, v))
    out = finance.hayashi_yoshida_covariance(
        spark.createDataFrame(rows, EVENT_SCHEMA)
    ).collect()
    assert len(out) == 1
    r = out[0]

    def _rets(seq):
        res = []
        for i in range(1, len(seq)):
            lr = _qr(math.log(seq[i][1] / seq[i - 1][1]), 12)
            res.append((seq[i - 1][0], seq[i][0], lr))
        return res

    ra, rb = _rets(ticks["aaa"]), _rets(ticks["bbb"])
    cov_u = n_pairs = 0
    for pa, ta, xa in ra:
        for pb, tb, xb in rb:
            if pa < tb and pb < ta:
                n_pairs += 1
                cov_u += math.floor(xa * xb * 1e12 + 0.5)
    rva = sum(math.floor(x * x * 1e12 + 0.5) for _, _, x in ra)
    rvb = sum(math.floor(x * x * 1e12 + 0.5) for _, _, x in rb)
    assert r["n_overlap_pairs"] == n_pairs
    assert (r["n_a"], r["n_b"]) == (len(ra), len(rb))
    assert r["hy_cov"] == pytest.approx(_qr(cov_u / 1e12, 10), abs=1e-10)
    assert r["hy_corr"] == pytest.approx(
        _qr(cov_u / math.sqrt(rva * rvb), 6), abs=1e-9
    )


# ---------------------------------------------------------------------------
# kendall_tau_matrix
# ---------------------------------------------------------------------------


def _two_symbol_frame(spark, rets_a, rets_b):
    import math as m

    rows, ca, cb = [], 100.0, 200.0
    rows.append((1, dt.datetime(2024, 1, 1, 12), 1, "aaa", ca, None))
    rows.append((2, dt.datetime(2024, 1, 1, 12), 1, "bbb", cb, None))
    for i, (xa, xb) in enumerate(zip(rets_a, rets_b)):
        ca *= m.exp(xa)
        cb *= m.exp(xb)
        ts = dt.datetime(2024, 1, 2, 12) + dt.timedelta(days=i)
        rows.append((2 * i + 3, ts, 1, "aaa", ca, None))
        rows.append((2 * i + 4, ts, 1, "bbb", cb, None))
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_kendall_perfect_agreement_and_disagreement(spark):
    steps = [0.01, -0.02, 0.03, -0.005, 0.015, -0.01, 0.02, 0.004]
    up = finance.kendall_tau_matrix(
        _two_symbol_frame(spark, steps, [2 * s for s in steps])
    ).collect()
    assert len(up) == 1 and up[0]["kendall_tau_b"] == 1.0
    down = finance.kendall_tau_matrix(
        _two_symbol_frame(spark, steps, [-s for s in steps])
    ).collect()
    assert len(down) == 1 and down[0]["kendall_tau_b"] == -1.0
    n = len(steps)
    assert up[0]["n0"] == n * (n - 1) // 2


def test_kendall_matches_python_on_fixture(spark):
    rows = finance.kendall_tau_matrix(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    series = {}
    for sym in pdf.event_type.unique():
        lr = _daily_lr(pdf, sym)
        days = sorted(pdf[pdf.event_type == sym]["day"].unique())[1:]
        series[sym] = dict(zip(days, lr))
    for r in rows[:4]:
        sa, sb = series[r["sym_a"]], series[r["sym_b"]]
        days = sorted(set(sa) & set(sb))
        pairs = [(sa[d], sb[d]) for d in days]
        C = D = ta = tb = 0
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
        n0 = len(pairs) * (len(pairs) - 1) // 2
        assert (r["n0"], r["concordant"], r["discordant"]) == (n0, C, D)
        denom = math.sqrt((n0 - ta) * (n0 - tb))
        assert r["kendall_tau_b"] == pytest.approx(
            _qr((C - D) / denom, 6), abs=1e-9
        )


# ---------------------------------------------------------------------------
# calendar_anomaly_report
# ---------------------------------------------------------------------------


def test_calendar_planted_monday_effect(spark):
    import math as m

    rows, c = [], 100.0
    d = dt.date(2024, 1, 1)  # a Monday
    eid = 0
    for i in range(70):
        day = d + dt.timedelta(days=i)
        if day.isoweekday() == 1:
            step = 0.02 if (i // 7) % 2 == 0 else 0.021
        else:
            step = 0.0005 if i % 2 == 0 else -0.0005
        c *= m.exp(step)
        eid += 1
        rows.append(
            (eid, dt.datetime.combine(day, dt.time(12)), 1, "sym", c, None)
        )
    out = {
        r["iso_dow"]: r
        for r in finance.calendar_anomaly_report(
            spark.createDataFrame(rows, EVENT_SCHEMA)
        ).collect()
    }
    assert out[1]["t_stat"] > 2.0 and out[1]["candidate_anomaly"] is True
    assert out[1]["mean_lr"] > 0.019
    for dow in (2, 3, 4, 5):
        assert abs(out[dow]["mean_lr"]) < 0.001


def test_calendar_matches_pandas_on_fixture(spark):
    import numpy as np

    rows = finance.calendar_anomaly_report(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    for r in rows[:10]:
        lr = _daily_lr(pdf, r["symbol"])
        days = sorted(pdf[pdf.event_type == r["symbol"]]["day"].unique())[1:]
        sel = [x for d, x in zip(days, lr) if d.isoweekday() == r["iso_dow"]]
        assert r["n_days"] == len(sel)
        mean_q = _qr(float(np.mean(sel)), 12)
        sd_q = _qr(float(np.std(sel, ddof=1)), 12)
        assert r["mean_lr"] == pytest.approx(_qr(mean_q, 6), abs=1e-9)
        if sd_q > 0:
            t = _qr(mean_q / (sd_q / math.sqrt(len(sel))), 6)
            assert r["t_stat"] == pytest.approx(t, abs=1e-6)


# ---------------------------------------------------------------------------
# newey_west_tstat
# ---------------------------------------------------------------------------


def test_newey_west_shrinks_t_under_positive_autocorr(spark):
    # strongly persistent returns (10-day blocks of the same sign with a
    # positive drift): the HAC variance absorbs the serial correlation,
    # so |t_nw| must come in well under |t_naive|
    import math as m

    steps = []
    for block in range(6):
        s = 0.012 if block % 2 == 0 else -0.008
        steps += [s] * 10
    closes, c = [], 100.0
    for s in steps:
        c *= m.exp(s)
        closes.append(c)
    rows = finance.newey_west_tstat(_tick_frame(spark, closes)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["t_naive"] is not None and r["t_newey_west"] is not None
    assert abs(r["t_newey_west"]) < abs(r["t_naive"])


def test_newey_west_matches_numpy_on_fixture(spark):
    import numpy as np

    rows = finance.newey_west_tstat(_events(spark)).collect()
    assert rows
    pdf = _fixture_pdf(spark)
    for r in rows:
        lr = _daily_lr(pdf, r["symbol"])
        n = len(lr)
        mean_q = _qr(float(np.mean(lr)), 12)
        dev = lr - mean_q
        g = [float(np.sum(np.floor(dev * dev * 1e12 + 0.5)))]
        for h in range(1, 6):
            g.append(float(np.sum(np.floor(dev[h:] * dev[:-h] * 1e12 + 0.5))))
        s_hac = g[0]
        for h in range(1, 6):
            s_hac += 2.0 * (1.0 - h / 6.0) * g[h]
        se_hac = math.sqrt(_qr(_qr(s_hac / 1e12 / n, 12) / n, 12))
        se_naive = math.sqrt(_qr(_qr(g[0] / 1e12 / n, 12) / n, 12))
        assert r["n_days"] == n
        if se_hac > 0:
            assert r["t_newey_west"] == pytest.approx(
                _qr(mean_q / se_hac, 6), abs=1e-6
            )
        if se_naive > 0:
            assert r["t_naive"] == pytest.approx(
                _qr(mean_q / se_naive, 6), abs=1e-6
            )
