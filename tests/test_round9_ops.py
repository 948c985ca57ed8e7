"""Round-9 operator referees: microstructure spread estimators, event
labeling, downside risk, mean-reversion fitting, HAR-RV, market
breadth, and retrieval evaluation.

Each test checks SEMANTICS independently of the DuckDB oracle (which
only proves both engines execute the same expressions): pure-Python /
numpy re-derivations over the fixture parquet, plus planted series with
analytically known answers.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from conftest import SF_SMOKE
from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators import finance, similarity


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def _qr(x: float, d: int = 6) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _duck_df(sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_SMOKE}/embeddings.parquet'"
    )
    return con.execute(sql).df()


def _daily_bars_pd():
    return _duck_df(
        """
        SELECT event_type AS symbol, date_trunc('day', ts) AS day,
               max(value) AS high, min(value) AS low,
               max(CASE WHEN rn = 1 THEN value END) AS close
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type,
                  date_trunc('day', ts) ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE value > 0)
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    )


# ---------------------------------------------------------------------------
# Corwin-Schultz
# ---------------------------------------------------------------------------


def test_corwin_schultz_referee(spark):
    """Pure-Python re-derivation of the two-day estimator from daily
    high/low bars must match the distributed result."""
    bars = _daily_bars_pd()
    k = 3.0 - 2.0 * 2.0**0.5
    expected: dict[str, tuple] = {}
    for sym, g in bars.groupby("symbol"):
        hs, ls = list(g["high"]), list(g["low"])
        spreads, n_pos = [], 0
        for i in range(len(hs) - 1):
            beta = math.log(hs[i] / ls[i]) ** 2 + math.log(hs[i + 1] / ls[i + 1]) ** 2
            gamma = math.log(max(hs[i], hs[i + 1]) / min(ls[i], ls[i + 1])) ** 2
            alpha = (math.sqrt(2 * beta) - math.sqrt(beta)) / k - math.sqrt(gamma / k)
            s = 2.0 * (math.exp(alpha) - 1.0) / (1.0 + math.exp(alpha))
            spreads.append(max(s, 0.0))
            n_pos += 1 if s > 0 else 0
        if spreads:
            expected[sym] = (
                len(spreads),
                sum(spreads) / len(spreads),
                n_pos / len(spreads),
            )
    rows = finance.corwin_schultz_spread(_events(spark)).collect()
    assert {r["symbol"] for r in rows} == set(expected)
    for r in rows:
        n, spread, pos = expected[r["symbol"]]
        assert r["n_pairs"] == n
        assert r["cs_spread"] == pytest.approx(spread, abs=2e-6)
        assert r["pct_positive"] == pytest.approx(pos, abs=2e-4)


def test_corwin_schultz_planted_flat_range(spark):
    """Two days with identical high/low and no drift: beta = 2 r^2,
    gamma = r^2 collapse alpha to exactly r = ln(H/L), so the spread is
    2(e^r - 1)/(e^r + 1) analytically."""
    data = []
    eid = 0
    for d in (1, 2):
        for minute, v in ((0, 100.0), (1, 101.0)):
            data.append(
                (eid, dt.datetime(2024, 1, d, 0, minute), 1, "flat", v, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = finance.corwin_schultz_spread(ev).collect()
    r = math.log(101.0 / 100.0)
    want = 2.0 * (math.exp(r) - 1.0) / (math.exp(r) + 1.0)
    assert row["n_pairs"] == 1
    assert row["cs_spread"] == pytest.approx(want, abs=2e-6)
    assert row["pct_positive"] == 1.0


# ---------------------------------------------------------------------------
# Triple-barrier labels
# ---------------------------------------------------------------------------


def _tb_expected(closes: list[float], horizon: int = 5, b: float = 0.01):
    n_up = n_down = n_timeout = 0
    days = []
    for i in range(len(closes) - horizon):
        label, d = 0, None
        for j in range(1, horizon + 1):
            r = closes[i + j] / closes[i] - 1.0
            if r >= b:
                label, d = 1, j
                break
            if r <= -b:
                label, d = -1, j
                break
        n_up += label == 1
        n_down += label == -1
        n_timeout += label == 0
        if d is not None:
            days.append(d)
    return n_up, n_down, n_timeout, days


def test_triple_barrier_referee(spark):
    bars = _daily_bars_pd()
    rows = {
        r["symbol"]: r
        for r in finance.triple_barrier_labels(_events(spark)).collect()
    }
    seen_any = False
    for sym, g in bars.groupby("symbol"):
        closes = list(g.sort_values("day")["close"])
        if len(closes) <= 5:
            assert sym not in rows
            continue
        n_up, n_down, n_timeout, days = _tb_expected(closes)
        r = rows[sym]
        seen_any = True
        assert (r["n_up"], r["n_down"], r["n_timeout"]) == (n_up, n_down, n_timeout)
        assert r["n_events"] == n_up + n_down + n_timeout
        if days:
            assert r["avg_days_to_hit"] == pytest.approx(
                sum(days) / len(days), abs=2e-4
            )
        else:
            assert r["avg_days_to_hit"] is None
    assert seen_any, "fixture produced no labelable symbol"


def test_triple_barrier_planted(spark):
    """closes 100, 100.5, 101.2, then flat: day 0 crosses +1% on the
    second forward day; day 1 never crosses and times out."""
    closes = [100.0, 100.5, 101.2, 101.0, 101.0, 101.0, 101.0]
    data = [
        (i, dt.datetime(2024, 1, 1 + i), 1, "p", c, "{}")
        for i, c in enumerate(closes)
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = finance.triple_barrier_labels(ev).collect()
    assert row["n_events"] == 2
    assert row["n_up"] == 1 and row["n_down"] == 0 and row["n_timeout"] == 1
    assert row["hit_rate"] == pytest.approx(0.5, abs=1e-9)
    assert row["avg_days_to_hit"] == pytest.approx(2.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Sortino
# ---------------------------------------------------------------------------


def test_sortino_referee(spark):
    bars = _daily_bars_pd()
    rows = {r["symbol"]: r for r in finance.sortino_ratio(_events(spark)).collect()}
    ann = 252.0**0.5
    for sym, g in bars.groupby("symbol"):
        closes = list(g.sort_values("day")["close"])
        rets = [closes[i] / closes[i - 1] - 1.0 for i in range(1, len(closes))]
        if len(rets) < 2:
            assert sym not in rows
            continue
        mean = sum(rets) / len(rets)
        dvar = sum(min(r, 0.0) ** 2 for r in rets) / len(rets)
        r = rows[sym]
        assert r["n_days"] == len(rets)
        assert r["mean_daily_ret"] == pytest.approx(mean, abs=2e-6)
        assert r["downside_dev_annual"] == pytest.approx(
            math.sqrt(dvar) * ann, abs=2e-6
        )
        if dvar > 0:
            assert r["sortino_annual"] == pytest.approx(
                mean / math.sqrt(dvar) * ann, abs=1e-4
            )


def test_sortino_all_positive_returns_has_null_ratio(spark):
    """A strictly rising series has zero downside deviation: the ratio
    must be NULL, never inf or a division error."""
    data = [
        (i, dt.datetime(2024, 1, 1 + i), 1, "up", 100.0 + i, "{}")
        for i in range(5)
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = finance.sortino_ratio(ev).collect()
    assert row["downside_dev_annual"] == 0.0
    assert row["sortino_annual"] is None


# ---------------------------------------------------------------------------
# Spread half-life
# ---------------------------------------------------------------------------


def test_spread_half_life_referee(spark):
    """numpy re-derivation: hedge ratio, AR(1) coefficient and half-life
    from the minute closes, via the same closed forms."""
    import numpy as np

    bars = _duck_df(
        """
        SELECT event_type AS symbol, date_trunc('minute', ts) AS mw,
               max(CASE WHEN rn = 1 THEN value END) AS c
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type,
                  date_trunc('minute', ts) ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    series = {
        sym: g.sort_values("mw").set_index("mw")["c"]
        for sym, g in bars.groupby("symbol")
    }
    rows = finance.spread_half_life(_events(spark)).collect()
    assert rows
    for r in rows:
        sa, sb = series[r["sym_a"]], series[r["sym_b"]]
        joint = sa.index.intersection(sb.index)
        pa, pb = sa[joint].to_numpy(), sb[joint].to_numpy()
        var_b = np.var(pb)
        if var_b == 0:
            assert r["hedge_ratio"] is None
            continue
        h = _qr(float(np.cov(pa, pb, bias=True)[0, 1] / var_b))
        assert r["hedge_ratio"] == pytest.approx(h, abs=2e-6)
        s = pa - h * pb
        ds, slag = s[1:] - s[:-1], s[:-1]
        assert r["n_obs"] == len(ds)
        var_lag = np.var(slag)
        if var_lag == 0:
            assert r["ar_coef"] is None
            continue
        b = _qr(1.0 + float(np.cov(ds, slag, bias=True)[0, 1] / var_lag))
        assert r["ar_coef"] == pytest.approx(b, abs=2e-6)
        if 0 < b < 1:
            assert r["half_life_minutes"] == pytest.approx(
                -math.log(2) / math.log(b), abs=2e-3
            )
            assert r["half_life_minutes"] > 0
        else:
            assert r["half_life_minutes"] is None


# ---------------------------------------------------------------------------
# HAR-RV
# ---------------------------------------------------------------------------


def test_har_rv_referee(spark):
    """numpy lstsq on the same (daily, weekly) feature matrix must agree
    with the closed-form Cramer solve."""
    import numpy as np

    rv = _duck_df(
        """
        WITH bars AS (
            SELECT event_type AS symbol, date_trunc('minute', ts) AS mw,
                   date_trunc('day', ts) AS day,
                   max(CASE WHEN rn = 1 THEN value END) AS c
            FROM (SELECT *, row_number() OVER (PARTITION BY event_type,
                      date_trunc('minute', ts) ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            GROUP BY 1, 2, 3
        ),
        lr AS (
            SELECT symbol, day,
                   ln(c / lag(c) OVER (PARTITION BY symbol, day ORDER BY mw)) AS lr
            FROM bars
        )
        SELECT symbol, day, sum(lr * lr) AS rv
        FROM lr WHERE lr IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    xs, ys = [], []
    for _, g in rv.groupby("symbol"):
        vals = [_qr(v) for v in g.sort_values("day")["rv"]]
        for i in range(4, len(vals) - 1):
            xs.append((vals[i], sum(vals[i - 4 : i + 1]) / 5.0))
            ys.append(vals[i + 1])
    [row] = finance.har_rv_regression(_events(spark)).collect()
    assert row["n_obs"] == len(ys)
    x = np.column_stack([np.ones(len(xs)), np.array(xs)])
    beta, *_ = np.linalg.lstsq(x, np.array(ys), rcond=None)
    assert row["intercept"] == pytest.approx(beta[0], rel=1e-3, abs=1e-3)
    assert row["beta_daily"] == pytest.approx(beta[1], rel=1e-3, abs=1e-4)
    assert row["beta_weekly"] == pytest.approx(beta[2], rel=1e-3, abs=1e-4)
    if row["r2"] is not None:
        assert -0.5 <= row["r2"] <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# Volume profile
# ---------------------------------------------------------------------------


def test_volume_profile_invariants(spark):
    ev = _events(spark)
    rows = finance.volume_profile(ev).collect()
    assert rows
    n_events = {
        r["symbol"]: r["n"]
        for r in ev.groupBy(ev.event_type.alias("symbol")).count()
        .withColumnRenamed("count", "n").collect()
    }
    by_sym: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert r["bin_low"] <= r["bin_high"]
        by_sym.setdefault(r["symbol"], []).append(r)
    for sym, rs in by_sym.items():
        assert sum(r["n_ticks"] for r in rs) == n_events[sym]
        assert sum(1 for r in rs if r["is_poc"]) == 1
        poc = next(r for r in rs if r["is_poc"])
        assert poc["volume"] == max(r["volume"] for r in rs)
        shares = [r["vol_share"] for r in rs if r["vol_share"] is not None]
        if shares:
            assert sum(shares) == pytest.approx(1.0, abs=1e-4)


def test_volume_profile_planted_poc(spark):
    """Ticks spread over [100, 110] with the volume piled at ~104.5:
    the POC must be bin 4 and bin edges must tile the range."""
    data = [
        (i, dt.datetime(2024, 1, 1, 0, i), 1, "s", 100.0 + i, '{"k": 1.0}')
        for i in range(11)
    ]
    data += [
        (100 + i, dt.datetime(2024, 1, 1, 1, i), 1, "s", 104.5, '{"k": 50.0}')
        for i in range(3)
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = finance.volume_profile(ev).collect()
    poc = next(r for r in rows if r["is_poc"])
    assert poc["bin"] == 4
    assert poc["volume"] == pytest.approx(151.0)  # 150 planted + value 104
    lows = [r["bin_low"] for r in sorted(rows, key=lambda r: r["bin"])]
    assert lows[0] == pytest.approx(100.0)


# ---------------------------------------------------------------------------
# Turnover HHI
# ---------------------------------------------------------------------------


def test_turnover_hhi_planted(spark):
    """Two symbols with 3:1 dollar volume: shares 0.75/0.25, HHI 0.625,
    effective names 1.6."""
    data = [
        (0, dt.datetime(2024, 1, 1, 10), 1, "a", 3.0, '{"k": 1.0}'),
        (1, dt.datetime(2024, 1, 1, 11), 1, "b", 1.0, '{"k": 1.0}'),
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = finance.turnover_hhi(ev).collect()
    assert row["n_symbols"] == 2
    assert row["hhi"] == pytest.approx(0.625, abs=1e-9)
    assert row["effective_names"] == pytest.approx(1.6, abs=1e-9)
    assert row["top_share"] == pytest.approx(0.75, abs=1e-9)


def test_turnover_hhi_bounds(spark):
    rows = finance.turnover_hhi(_events(spark)).collect()
    assert rows
    for r in rows:
        if r["hhi"] is None:
            continue
        assert 1.0 / r["n_symbols"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-6
        assert r["effective_names"] == pytest.approx(1.0 / r["hhi"], abs=2e-4)
        assert r["top_share"] * r["n_symbols"] >= 1.0 - 1e-6


# ---------------------------------------------------------------------------
# Retrieval eval
# ---------------------------------------------------------------------------


def test_retrieval_mrr_ndcg_referee(spark):
    """numpy re-derivation of every per-probe metric from the raw
    embeddings, including the quantize-then-tiebreak ranking."""
    import numpy as np

    from real_time_financial_lakehouse_spark.catalog import load_table as lt

    emb = _duck_df("SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id")
    vecs = np.array([np.array(e, dtype=np.float64) for e in emb["embedding"]])
    labels = list(emb["label"])
    ids = list(emb["vec_id"])
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    label_total = {l: labels.count(l) for l in set(labels)}
    rows = {
        r["query_id"]: r
        for r in similarity.retrieval_mrr_ndcg(lt(spark, SF_SMOKE, "embeddings")).collect()
    }
    assert len(rows) == 20
    k = 10
    for qi in range(20):
        q = vecs[qi]
        cands = []
        for j in range(len(ids)):
            if ids[j] == qi:
                continue
            denom = norms[qi] * norms[j]
            c = float(q @ vecs[j] / denom) if denom != 0 else 0.0
            cands.append((-_qr(c), ids[j], labels[j]))
        cands.sort()
        top = cands[:k]
        rel = [1 if lab == labels[qi] else 0 for _, _, lab in top]
        first = next((i + 1 for i, x in enumerate(rel) if x), None)
        dcg = sum(x * similarity.DCG_GAINS[i] for i, x in enumerate(rel))
        n_rel = label_total[labels[qi]] - 1
        idcg = similarity.IDCG_PREFIX[min(n_rel, k)]
        r = rows[qi]
        assert r["first_rel_rank"] == first
        assert r["reciprocal_rank"] == pytest.approx(
            1.0 / first if first else 0.0, abs=2e-6
        )
        assert r["precision_at_k"] == pytest.approx(sum(rel) / k, abs=2e-6)
        if n_rel > 0:
            assert r["recall_at_k"] == pytest.approx(sum(rel) / n_rel, abs=2e-6)
        assert r["ndcg_at_k"] == pytest.approx(
            dcg / idcg if idcg > 0 else 0.0, abs=2e-6
        )
        assert -1e-9 <= r["ndcg_at_k"] <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# Omega / Calmar / capture / gap-fill (batch 2)
# ---------------------------------------------------------------------------


def _planted_closes(spark, closes, sym="p"):
    data = [
        (i, dt.datetime(2024, 1, 1 + i), 1, sym, c, "{}")
        for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_omega_planted(spark):
    """returns +1% then -2%: omega = E[r+]/E[r-] = 0.005/0.01 = 0.5."""
    [row] = finance.omega_ratio(
        _planted_closes(spark, [100.0, 101.0, 101.0 * 0.98])
    ).collect()
    assert row["n_days"] == 2
    assert row["omega"] == pytest.approx(0.5, abs=1e-6)
    assert row["avg_gain"] == pytest.approx(0.005, abs=1e-6)
    assert row["avg_loss"] == pytest.approx(0.01, abs=1e-6)


def test_omega_referee(spark):
    bars = _daily_bars_pd()
    rows = {r["symbol"]: r for r in finance.omega_ratio(_events(spark)).collect()}
    for sym, g in bars.groupby("symbol"):
        closes = list(g.sort_values("day")["close"])
        rets = [closes[i] / closes[i - 1] - 1.0 for i in range(1, len(closes))]
        if not rets:
            continue
        gain = sum(max(r, 0.0) for r in rets) / len(rets)
        loss = sum(max(-r, 0.0) for r in rets) / len(rets)
        r = rows[sym]
        assert r["avg_gain"] == pytest.approx(gain, abs=2e-6)
        assert r["avg_loss"] == pytest.approx(loss, abs=2e-6)
        if loss > 0:
            assert r["omega"] == pytest.approx(gain / loss, abs=1e-4)


def test_calmar_planted(spark):
    """closes 100 -> 110 -> 99: maxdd = 1 - 99/110, annual log return
    (252/3) ln(99/100), calmar their ratio."""
    [row] = finance.calmar_ratio(_planted_closes(spark, [100.0, 110.0, 99.0])).collect()
    maxdd = 1.0 - 99.0 / 110.0
    ann = (252.0 / 3.0) * math.log(99.0 / 100.0)
    assert row["max_drawdown"] == pytest.approx(maxdd, abs=2e-6)
    assert row["annual_log_return"] == pytest.approx(ann, abs=2e-6)
    assert row["calmar_log"] == pytest.approx(ann / maxdd, abs=1e-3)


def test_updown_capture_referee(spark):
    import collections

    bars = _daily_bars_pd()
    rets_by_day: dict = collections.defaultdict(dict)
    for sym, g in bars.groupby("symbol"):
        g = g.sort_values("day")
        closes, days = list(g["close"]), list(g["day"])
        for i in range(1, len(closes)):
            rets_by_day[days[i]][sym] = closes[i] / closes[i - 1] - 1.0
    per_sym: dict = collections.defaultdict(lambda: ([], []))
    for day, m in rets_by_day.items():
        mkt = sum(m.values()) / len(m)
        for sym, r in m.items():
            if mkt > 0:
                per_sym[sym][0].append((r, mkt))
            elif mkt < 0:
                per_sym[sym][1].append((r, mkt))
    rows = {r["symbol"]: r for r in finance.updown_capture(_events(spark)).collect()}
    for sym, (ups, dns) in per_sym.items():
        r = rows[sym]
        assert r["n_up_days"] == len(ups)
        assert r["n_down_days"] == len(dns)
        if ups:
            num = sum(x for x, _ in ups) / len(ups)
            den = sum(y for _, y in ups) / len(ups)
            if den != 0:
                assert r["up_capture"] == pytest.approx(num / den, abs=1e-4)
        if dns:
            num = sum(x for x, _ in dns) / len(dns)
            den = sum(y for _, y in dns) / len(dns)
            if den != 0:
                assert r["down_capture"] == pytest.approx(num / den, abs=1e-4)


def test_gap_fill_planted(spark):
    """day2 gaps up unfilled (low stays above prev close), day3 gaps
    down and fills (high re-touches prev close)."""
    data = [
        (0, dt.datetime(2024, 1, 1, 10), 1, "g", 100.0, "{}"),
        (1, dt.datetime(2024, 1, 2, 10), 1, "g", 102.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 11), 1, "g", 101.5, "{}"),
        (3, dt.datetime(2024, 1, 3, 10), 1, "g", 99.0, "{}"),
        (4, dt.datetime(2024, 1, 3, 11), 1, "g", 101.6, "{}"),
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = finance.gap_fill_probability(ev).collect()
    assert row["n_days"] == 2
    assert row["n_gap_up"] == 1 and row["pct_up_filled"] == 0.0
    assert row["n_gap_down"] == 1 and row["pct_down_filled"] == 1.0


# ---------------------------------------------------------------------------
# SemDeDup sweep / tokenizer fertility (batch 2, LLM-data)
# ---------------------------------------------------------------------------


def test_semdedup_sweep_referee(spark):
    """numpy recount of within-cell pairs and removed docs per
    threshold, monotone in the threshold."""
    import numpy as np

    from real_time_financial_lakehouse_spark.catalog import load_table as lt

    emb = _duck_df("SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id")
    vecs = np.array([np.array(e, dtype=np.float64) for e in emb["embedding"]])
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    labels, ids = list(emb["label"]), list(emb["vec_id"])
    thresholds = (0.25, 0.30, 0.35, 0.40)
    counts = {t: [0, set()] for t in thresholds}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if labels[i] != labels[j]:
                continue
            denom = norms[i] * norms[j]
            c = _qr(float(vecs[i] @ vecs[j] / denom)) if denom != 0 else 0.0
            for t in thresholds:
                if c >= t:
                    counts[t][0] += 1
                    counts[t][1].add(max(ids[i], ids[j]))
    rows = {
        r["threshold"]: r
        for r in similarity.semdedup_threshold_sweep(
            lt(spark, SF_SMOKE, "embeddings")
        ).collect()
    }
    total = len(ids)
    prev_pairs = None
    for t in sorted(thresholds):
        n_pairs, removed = counts[t]
        if n_pairs == 0:
            assert t not in rows
            continue
        r = rows[t]
        assert r["n_pairs"] == n_pairs
        assert r["n_docs_removed"] == len(removed)
        assert r["pct_corpus_removed"] == pytest.approx(
            len(removed) / total, abs=2e-6
        )
        if prev_pairs is not None:
            assert n_pairs <= prev_pairs
        prev_pairs = n_pairs


def test_tokenizer_fertility_referee(spark):
    import re

    from real_time_financial_lakehouse_spark.catalog import load_table as lt
    from real_time_financial_lakehouse_spark.operators import text as text_ops

    docs = _duck_df("SELECT lang, source, n_chars, text FROM '%s/documents.parquet'"
                    % SF_SMOKE)
    groups: dict = {}
    for _, row in docs.iterrows():
        toks = re.split(r"\s+", row["text"].strip())
        n = len(toks)
        g = groups.setdefault((row["lang"], row["source"]), [])
        g.append(
            (n, len(set(toks)) / n if n else None, row["n_chars"] / n if n else None)
        )
    rows = {
        (r["lang"], r["source"]): r
        for r in text_ops.tokenizer_fertility(lt(spark, SF_SMOKE, "documents")).collect()
    }
    assert set(rows) == set(groups)
    for key, vals in groups.items():
        r = rows[key]
        assert r["n_docs"] == len(vals)
        assert r["avg_tokens_per_doc"] == pytest.approx(
            sum(v[0] for v in vals) / len(vals), abs=2e-4
        )
        ttrs = [v[1] for v in vals if v[1] is not None]
        if ttrs:
            assert r["avg_type_token_ratio"] == pytest.approx(
                sum(ttrs) / len(ttrs), abs=2e-6
            )
        cpts = [v[2] for v in vals if v[2] is not None]
        if cpts:
            assert r["avg_chars_per_token"] == pytest.approx(
                sum(cpts) / len(cpts), abs=2e-6
            )


# ---------------------------------------------------------------------------
# Streaming turnover HHI
# ---------------------------------------------------------------------------


def test_streaming_turnover_hhi_matches_batch(spark):
    """The micro-batched merge must reproduce the batch report exactly:
    dollar volume is additive, so batch boundaries only reorder float
    sums, which the shared 1e-6 quantization absorbs."""
    from real_time_financial_lakehouse_spark.streaming.silver import (
        streaming_turnover_hhi,
    )

    batch = {
        r["day"]: r for r in finance.turnover_hhi(_events(spark)).collect()
    }
    stream = streaming_turnover_hhi(spark, SF_SMOKE).collect()
    assert len(stream) == len(batch)
    for r in stream:
        b = batch[r["day"]]
        assert r["n_symbols"] == b["n_symbols"]
        assert r["hhi"] == b["hhi"]
        assert r["effective_names"] == b["effective_names"]
        assert r["top_share"] == b["top_share"]


# ---------------------------------------------------------------------------
# Mutual information / k-anonymity (profiling batch)
# ---------------------------------------------------------------------------


def test_mutual_information_planted_perfect_dependence(spark):
    """Two types with disjoint value ranges and equal counts: MI = ln 2,
    NMI = 1, chi2 = N (the 2x2 perfect-association case)."""
    from real_time_financial_lakehouse_spark.operators.profiling import (
        mutual_information_profile,
    )

    data = [
        (0, dt.datetime(2024, 1, 1, 10), 1, "a", 0.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 11), 1, "a", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 12), 1, "b", 99.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 13), 1, "b", 100.0, "{}"),
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = mutual_information_profile(ev).collect()
    assert row["n_rows"] == 4 and row["n_types"] == 2 and row["n_bins_used"] == 2
    assert row["mi_nats"] == pytest.approx(math.log(2), abs=2e-6)
    assert row["nmi"] == pytest.approx(1.0, abs=2e-6)
    assert row["chi2"] == pytest.approx(4.0, abs=2e-6)
    assert row["dof"] == 1


def test_mutual_information_referee(spark):
    """numpy re-derivation of MI / NMI / chi2 from the contingency
    table built with the same equal-width binning."""
    import numpy as np

    from real_time_financial_lakehouse_spark.operators.profiling import (
        mutual_information_profile,
    )

    df = _duck_df("SELECT event_type AS t, value FROM events")
    lo, hi = df["value"].min(), df["value"].max()
    bins = np.minimum(
        np.floor((df["value"] - lo) / (hi - lo) * 10).astype(int), 9
    )
    types = sorted(df["t"].unique())
    cont = np.zeros((len(types), 10))
    for t, b in zip(df["t"], bins):
        cont[types.index(t), b] += 1
    n = cont.sum()
    pi, pj = cont.sum(axis=1) / n, cont.sum(axis=0) / n
    mi = sum(
        cont[i, j] / n * math.log(cont[i, j] * n / (cont[i].sum() * cont[:, j].sum()))
        for i in range(len(types))
        for j in range(10)
        if cont[i, j] > 0
    )
    h_rows = -sum(p * math.log(p) for p in pi if p > 0)
    h_cols = -sum(p * math.log(p) for p in pj if p > 0)
    chi2 = n * (
        sum(
            cont[i, j] ** 2 / (cont[i].sum() * cont[:, j].sum())
            for i in range(len(types))
            for j in range(10)
            if cont[i, j] > 0
        )
        - 1.0
    )
    [row] = mutual_information_profile(_events(spark)).collect()
    assert row["n_rows"] == int(n)
    assert row["mi_nats"] == pytest.approx(mi, abs=2e-6)
    assert row["nmi"] == pytest.approx(mi / math.sqrt(h_rows * h_cols), abs=2e-6)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-3)
    assert 0.0 - 1e-9 <= row["nmi"] <= 1.0 + 1e-9


def test_k_anonymity_planted(spark):
    """Groups of size 1 / 4 / 10 (split by type, one day, one band):
    min_k = 1, pct below the 2/5/10 bars = 1/15, 5/15, 5/15."""
    from real_time_financial_lakehouse_spark.operators.profiling import (
        k_anonymity_report,
    )

    data, eid = [], 0
    for sym, cnt in (("a", 1), ("b", 4), ("c", 10)):
        for i in range(cnt):
            data.append(
                (eid, dt.datetime(2024, 1, 1, 0, eid), 1, sym, 50.0 + i, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = k_anonymity_report(ev).collect()
    assert row["n_rows"] == 15 and row["n_groups"] == 3 and row["min_k"] == 1
    assert row["avg_group_size"] == pytest.approx(5.0, abs=1e-9)
    assert row["pct_rows_k_lt_2"] == pytest.approx(1 / 15, abs=2e-6)
    assert row["pct_rows_k_lt_5"] == pytest.approx(5 / 15, abs=2e-6)
    assert row["pct_rows_k_lt_10"] == pytest.approx(5 / 15, abs=2e-6)


# ---------------------------------------------------------------------------
# Dedup cluster histogram / n-gram coverage curve (batch 4)
# ---------------------------------------------------------------------------


def test_dedup_cluster_histogram_consistency(spark):
    """The histogram must tile the corpus exactly: sum(n_docs) = corpus
    size, sum(pct) ~ 1, and it must agree with a direct recount of the
    dedup_clusters output."""
    import collections

    from real_time_financial_lakehouse_spark.catalog import load_table as lt
    from real_time_financial_lakehouse_spark.operators import dedup

    docs = lt(spark, SF_SMOKE, "documents")
    clusters = dedup.dedup_clusters(docs).collect()
    sizes = collections.Counter(
        collections.Counter(r["cluster_id"] for r in clusters).values()
    )
    rows = dedup.dedup_cluster_histogram(docs).collect()
    total = len(clusters)
    assert {(r["cluster_size"], r["n_clusters"]) for r in rows} == set(sizes.items())
    assert sum(r["n_docs"] for r in rows) == total
    assert sum(r["pct_corpus"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_ngram_coverage_curve_referee(spark):
    """Pure-Python recount of the cumulative top-k coverage with the
    same (freq desc, token) ranking."""
    import collections
    import re

    from real_time_financial_lakehouse_spark.catalog import load_table as lt
    from real_time_financial_lakehouse_spark.operators import text as text_ops

    docs = _duck_df(f"SELECT text FROM '{SF_SMOKE}/documents.parquet'")
    freq = collections.Counter()
    for t in docs["text"]:
        freq.update(re.split(r"\s+", t.strip()))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    rows = {
        r["top_k"]: r
        for r in text_ops.ngram_coverage_curve(lt(spark, SF_SMOKE, "documents")).collect()
    }
    prev = 0.0
    for k in (10, 100, 1000):
        covered = sum(n for _, n in ranked[:k])
        r = rows[k]
        assert r["n_tokens_used"] == min(k, len(ranked))
        assert r["covered_occurrences"] == covered
        assert r["coverage_pct"] == pytest.approx(covered / total, abs=2e-6)
        assert r["coverage_pct"] >= prev  # monotone in k
        prev = r["coverage_pct"]
