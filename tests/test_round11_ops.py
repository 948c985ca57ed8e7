"""Semantics referees for the round-11 additions, beyond the DuckDB
oracle: planted analytic cases with hand-computable answers plus
numpy/pandas re-derivations on the fixture."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from conftest import SF_SMOKE
from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators import finance, relational
from real_time_financial_lakehouse_spark.operators.similarity import (
    embedding_centroid_drift,
)

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


# ---------------------------------------------------------------------------
# ljung_box_autocorr
# ---------------------------------------------------------------------------


def test_ljung_box_matches_numpy_acf_on_fixture(spark):
    import numpy as np

    rows = finance.ljung_box_autocorr(_events(spark)).collect()
    assert rows
    pdf = (
        _events(spark)
        .toPandas()
        .query("value > 0")
        .sort_values(["ts", "event_id"])
    )
    pdf["day"] = pdf["ts"].dt.floor("D")
    for r in rows:
        g = pdf[pdf.event_type == r["symbol"]]
        closes = g.groupby("day").last()["value"].sort_index()
        lr = np.log(closes / closes.shift(1)).dropna().to_numpy()
        lr = np.floor(lr * 1e12 + 0.5) / 1e12
        assert r["n_days"] == len(lr)
        mean = math.floor(np.mean(lr) * 1e12 + 0.5) / 1e12
        dev = lr - mean
        den = np.sum(np.floor(dev * dev * 1e12 + 0.5))
        qsum = 0.0
        for k in range(1, 6):
            num = np.sum(np.floor(dev[k:] * dev[:-k] * 1e12 + 0.5))
            rho = _qr(num / den, 6)
            assert r[f"acf_{k}"] == pytest.approx(rho, abs=1e-9), (
                r["symbol"],
                k,
            )
            qsum += rho * rho / (len(lr) - k)
        want_q = _qr(len(lr) * (len(lr) + 2.0) * qsum, 4)
        assert r["ljung_box_q"] == pytest.approx(want_q, abs=1e-6)
        assert r["reject_5pct"] == (r["ljung_box_q"] > 11.0705)


def test_ljung_box_alternating_series_rejects(spark):
    # +1%/-1% alternation: acf_1 strongly negative, Q blows past the
    # chi-square(5) critical value
    closes, c = [], 100.0
    for i in range(60):
        c *= 1.01 if i % 2 == 0 else 1 / 1.01
        closes.append(c)
    rows = finance.ljung_box_autocorr(_tick_frame(spark, closes)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["acf_1"] < -0.9
    assert r["reject_5pct"] is True


def test_ljung_box_constant_returns_have_zero_variance_no_row(spark):
    # constant growth: every lr identical -> den_u = 0 -> filtered out
    closes = [100.0 * (1.02**i) for i in range(40)]
    rows = finance.ljung_box_autocorr(_tick_frame(spark, closes)).collect()
    assert rows == []


# ---------------------------------------------------------------------------
# kupiec_var_backtest
# ---------------------------------------------------------------------------


def test_kupiec_matches_pandas_on_fixture(spark):
    import numpy as np

    rows = finance.kupiec_var_backtest(_events(spark)).collect()
    assert rows
    pdf = (
        _events(spark)
        .toPandas()
        .query("value > 0")
        .sort_values(["ts", "event_id"])
    )
    pdf["day"] = pdf["ts"].dt.floor("D")
    for r in rows:
        g = pdf[pdf.event_type == r["symbol"]]
        closes = g.groupby("day").last()["value"].sort_index()
        lr = np.log(closes / closes.shift(1)).dropna().to_numpy()
        lr = np.floor(lr * 1e12 + 0.5) / 1e12
        n = len(lr)
        q05 = math.floor(np.quantile(lr, 0.05) * 1e12 + 0.5) / 1e12
        n1 = int(np.sum(lr <= q05))
        assert r["n_days"] == n
        assert r["n_breach"] == n1
        assert r["var_95"] == pytest.approx(_qr(q05, 6), abs=1e-9)
        lnp = _qr(math.log(0.05), 12)
        ln1p = _qr(math.log(0.95), 12)
        ll_null = (n - n1) * ln1p + n1 * lnp
        if 0 < n1 < n:
            ll_alt = (n - n1) * _qr(math.log(1 - n1 / n), 12) + n1 * _qr(
                math.log(n1 / n), 12
            )
        else:
            ll_alt = 0.0
        assert r["lr_pof"] == pytest.approx(
            _qr(2 * (ll_alt - ll_null), 4), abs=1e-6
        )
        assert r["reject_5pct"] == (r["lr_pof"] > 3.8415)


def test_kupiec_calibrated_var_accepts(spark):
    # 40 days of i.i.d.-ish returns: the interpolated 5% quantile of the
    # sample is breached by ~5% of the sample BY CONSTRUCTION, so the
    # POF test must not reject the model on its own calibration data
    closes, c = [], 100.0
    deltas = [0.01, -0.02, 0.005, 0.015, -0.01, 0.02, -0.005, -0.015]
    for i in range(41):
        c *= 1 + deltas[i % len(deltas)] * (1 + 0.01 * (i % 7))
        closes.append(c)
    rows = finance.kupiec_var_backtest(_tick_frame(spark, closes)).collect()
    assert len(rows) == 1
    assert rows[0]["reject_5pct"] is False


# ---------------------------------------------------------------------------
# window_funnel_stages
# ---------------------------------------------------------------------------


def test_window_funnel_planted_stages(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def ev(eid, minutes, uid, etype):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, etype, 1.0, None)

    rows = [
        # user 1: full chain inside the window -> stage 3
        ev(1, 0, 1, "view"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
        # user 2: click but purchase BEFORE the click -> stage 2
        ev(4, 0, 2, "view"), ev(5, 30, 2, "click"), ev(6, 15, 2, "purchase"),
        # user 3: click outside the 6h window -> stage 1
        ev(7, 0, 3, "view"), ev(8, 361, 3, "click"),
        # user 4: no view at all -> not an entrant
        ev(9, 0, 4, "click"), ev(10, 5, 4, "purchase"),
        # user 5: click at the exact deadline boundary (inclusive) -> 2
        ev(11, 0, 5, "view"), ev(12, 360, 5, "click"),
        # user 6: purchase in-window but BEFORE the first view's click ->
        # strict order means it cannot count; no click at all -> stage 1
        ev(13, 0, 6, "view"), ev(14, 10, 6, "purchase"),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    got = {
        r["max_stage"]: r
        for r in relational.window_funnel_stages(df).collect()
    }
    assert got[1]["n_users"] == 2  # users 3, 6
    assert got[2]["n_users"] == 2  # users 2, 5
    assert got[3]["n_users"] == 1  # user 1
    assert got[1]["pct_of_entrants"] == pytest.approx(_qr(2 / 5, 6))
    total = sum(r["n_users"] for r in got.values())
    assert total == 5  # user 4 never entered


def test_window_funnel_strict_order_not_reanchored(spark):
    # purchase lands inside the t1+6h window but before the click ->
    # only reachable if stage 3 re-anchored at t2; it must NOT count
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t0, 1, "view", 1.0, None),
        (2, t0 + dt.timedelta(minutes=50), 1, "purchase", 1.0, None),
        (3, t0 + dt.timedelta(minutes=100), 1, "click", 1.0, None),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    got = {r["max_stage"]: r["n_users"] for r in relational.window_funnel_stages(df).collect()}
    assert got == {2: 1}


# ---------------------------------------------------------------------------
# tail_dependence_matrix
# ---------------------------------------------------------------------------


def test_tail_dependence_identical_paths_lambda_one(spark):
    closes, c = [], 100.0
    deltas = [0.01, -0.03, 0.02, -0.01, 0.015, -0.02, 0.005]
    for i in range(40):
        c *= 1 + deltas[i % len(deltas)]
        closes.append(c)
    df = _tick_frame(spark, closes, "aaa").unionByName(
        _tick_frame(spark, closes, "bbb")
    )
    rows = finance.tail_dependence_matrix(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sym_a"] == "aaa" and r["sym_b"] == "bbb"
    assert r["n_a_tail"] == r["n_b_tail"] == r["n_both"]
    assert r["lambda_lower"] == 1.0
    assert r["tail_lift"] == pytest.approx(
        _qr(r["n_days"] / r["n_a_tail"], 4)
    )


def test_tail_dependence_matches_pandas_on_fixture(spark):
    import numpy as np

    rows = finance.tail_dependence_matrix(_events(spark)).collect()
    assert rows
    pdf = (
        _events(spark)
        .toPandas()
        .query("value > 0")
        .sort_values(["ts", "event_id"])
    )
    pdf["day"] = pdf["ts"].dt.floor("D")
    flags = {}
    for sym, g in pdf.groupby("event_type"):
        closes = g.groupby("day").last()["value"].sort_index()
        lr = np.log(closes / closes.shift(1)).dropna()
        lr = np.floor(lr * 1e12 + 0.5) / 1e12
        if len(lr) < 10:
            continue
        q = math.floor(np.quantile(lr, 0.2) * 1e12 + 0.5) / 1e12
        flags[sym] = lr <= q
    for r in rows:
        fa, fb = flags[r["sym_a"]], flags[r["sym_b"]]
        joint = fa.index.intersection(fb.index)
        both = int((fa.loc[joint] & fb.loc[joint]).sum())
        assert r["n_days"] == len(joint)
        assert r["n_both"] == both
        assert r["n_a_tail"] == int(fa.loc[joint].sum())
        assert r["n_b_tail"] == int(fb.loc[joint].sum())


# ---------------------------------------------------------------------------
# embedding_centroid_drift
# ---------------------------------------------------------------------------


def test_centroid_drift_identical_vectors_cosine_one(spark):
    rows = [(i, [1.0, 2.0, 3.0, 4.0], 7) for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = embedding_centroid_drift(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_vec_a"] + r["n_vec_b"] == 20
    assert r["centroid_cosine"] == 1.0
    assert r["centroid_l2"] == 0.0


def test_centroid_drift_matches_numpy_on_fixture(spark):
    import hashlib

    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {r["label"]: r for r in embedding_centroid_drift(emb).collect()}
    pdf = emb.toPandas()
    pdf["half"] = [
        int(hashlib.md5(f"drift:{v}".encode()).hexdigest()[:15], 16) % 2
        for v in pdf["vec_id"]
    ]
    for label, g in pdf.groupby("label"):
        halves = {}
        for h, gg in g.groupby("half"):
            m = np.mean(np.stack(gg["embedding"].map(np.asarray)), axis=0)
            halves[h] = np.floor(m.astype(np.float64) * 1e12 + 0.5) / 1e12
        if set(halves) != {0, 1}:
            continue
        a, b = halves[0], halves[1]
        dot = np.sum(np.floor(a * b * 1e12 + 0.5))
        na = np.sum(np.floor(a * a * 1e12 + 0.5))
        nb = np.sum(np.floor(b * b * 1e12 + 0.5))
        want = _qr(dot / math.sqrt(na * nb), 6)
        assert got[label]["centroid_cosine"] == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------------------
# streaming_value_quantiles
# ---------------------------------------------------------------------------


def test_streaming_quantiles_equal_batch_exactly(spark):
    from real_time_financial_lakehouse_spark.operators.rollup import (
        value_percentiles,
    )
    from real_time_financial_lakehouse_spark.streaming.silver import (
        streaming_value_quantiles,
    )

    streamed = {
        r["symbol"]: r
        for r in streaming_value_quantiles(spark, SF_SMOKE).collect()
    }
    batch = {r["symbol"]: r for r in value_percentiles(_events(spark)).collect()}
    assert set(streamed) == set(batch)
    for sym, b in batch.items():
        s = streamed[sym]
        # exact equality: the gridded histogram is lossless and the
        # reconstruction uses the same interpolation formula
        assert s["p50"] == b["p50"], sym
        assert s["p90"] == b["p90"], sym
        assert s["p99"] == b["p99"], sym
