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


def test_streaming_kalman_survives_mid_day_batch_split(spark, tmp_path):
    """The hard case for event-time bar finalization: one calendar day's
    ticks split across TWO micro-batches.  A fold that commits a day on
    first sight would Kalman-step the interim close and corrupt every
    later state; the pending-bar design must land exactly on the batch
    twin's result."""
    import os

    from real_time_financial_lakehouse_spark.streaming.stateful import kalman_stream

    def mk(eid, day, sec, sym, v):
        return (eid, dt.datetime(2024, 1, day, 0, 0, sec), 1, sym, v, "{}")

    # day 3 straddles the file boundary; its true close (99.0) only
    # appears in the second file
    f1 = [mk(0, 1, 0, "s", 100.0), mk(1, 2, 0, "s", 102.0), mk(2, 3, 0, "s", 95.0)]
    f2 = [mk(3, 3, 30, "s", 99.0), mk(4, 4, 0, "s", 101.0)]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(src / "b"))
    # file source orders by modification time: make 'a' strictly older
    for sub, mt in (("a", 1_000_000_000), ("b", 2_000_000_000)):
        for f in (src / sub).glob("*.parquet"):
            os.utime(f, (mt, mt))

    out_rows = []
    batches = []

    def _collect(batch_df, batch_id):
        rows = batch_df.collect()
        if rows:
            batches.append(batch_id)
            out_rows.extend(rows)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        kalman_stream(stream)
        .writeStream.foreachBatch(_collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(batches) >= 2, "expected one micro-batch per file"
    final = max(out_rows, key=lambda r: r["n_days"])
    ev = spark.createDataFrame(f1 + f2, schema)
    batch = finance.kalman_price_smooth(ev).collect()[0]
    assert final["n_days"] == batch["n_days"] == 4
    assert final["last_close"] == 101.0
    # the batch query quantizes at 1e-6; compare at that granularity
    assert final["x_raw"] == pytest.approx(batch["kalman_level"], abs=1e-6)
    assert final["p_raw"] == pytest.approx(batch["error_cov"], abs=1e-6)
    assert final["k_raw"] == pytest.approx(batch["kalman_gain"], abs=1e-6)
    # the provisional mid-day emission after batch 1 must use day 3's
    # interim close without committing it
    b1 = [r for r in out_rows if r["n_days"] == 3]
    assert b1 and b1[0]["last_close"] == 95.0


def test_jl_distortion_concentrates_near_one(spark):
    """JL lemma referee: with m = 16 rows the per-pair distortion SD is
    ~ sqrt(2/m) ~ 0.35, so the per-probe MEAN over hundreds of pairs
    must sit well inside [0.8, 1.2] -- a mis-scaled projection (e.g. a
    missing sqrt(3/m)) lands near 2.3 and fails loudly."""
    from real_time_financial_lakehouse_spark.operators.similarity import (
        jl_projection_distortion,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = jl_projection_distortion(emb).collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] > 0
        assert 0.8 <= r["mean_distortion"] <= 1.2
        assert r["min_distortion"] <= r["mean_distortion"] <= r["max_distortion"]
        assert r["min_distortion"] > 0


def test_jl_plan_broadcasts_probes(spark):
    from real_time_financial_lakehouse_spark.operators.similarity import (
        jl_projection_distortion,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = (
        jl_projection_distortion(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_shallow_clone_is_zero_copy_and_isolated(spark, tmp_path):
    """Clone manifest must reference the SOURCE's physical files (no
    copy), later commits must not cross table boundaries, and vacuum on
    the clone must never reap shared source data."""
    import os

    from real_time_financial_lakehouse_spark.operators import versioned

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    src = str(tmp_path / "src_tbl")
    dst = str(tmp_path / "dst_tbl")
    versioned.commit_version(df, src)
    versioned.clone_table(src, dst)

    src_files = set(versioned.read_manifest(src, 0)["files"])
    clone_files = set(versioned.read_manifest(dst, 0)["files"])
    assert clone_files == src_files, "shallow clone must share files verbatim"
    m = versioned.read_manifest(dst, 0)
    assert m["txn"]["clone_of"] == os.path.abspath(src)
    assert m["txn"]["source_version"] == 0

    # diverge the clone; the source's version chain must not move
    versioned.commit_version(
        spark.range(10, 15).selectExpr("id", "id * 2 AS v"), dst, mode="append"
    )
    assert versioned.table_versions(src) == [0]
    assert versioned.table_versions(dst) == [0, 1]
    assert versioned.read_version(spark, src).count() == 10
    assert versioned.read_version(spark, dst).count() == 15

    # vacuum the clone aggressively: shared source files must survive
    versioned.vacuum(dst, orphan_grace_s=0.0)
    for f in src_files:
        assert os.path.exists(f), "clone vacuum deleted a shared source file"
    assert versioned.read_version(spark, src).count() == 10

    # cloning onto an existing table is refused
    with pytest.raises(FileExistsError):
        versioned.clone_table(src, dst)

    # the harshest case: a clone that OVERWRITES (drops every shared
    # reference) then vacuums -- the doomed v0 names source files, but
    # vacuum only removes directories under its own table root, so the
    # source is untouchable by construction
    dst2 = str(tmp_path / "dst2_tbl")
    versioned.clone_table(src, dst2)
    versioned.commit_version(spark.range(3).selectExpr("id", "id AS v"), dst2)
    versioned.vacuum(dst2, orphan_grace_s=0.0)
    for f in src_files:
        assert os.path.exists(f), "overwritten clone's vacuum reaped source data"
    assert versioned.read_version(spark, src).count() == 10


def test_adx_matches_numpy_wilder_recursion(spark):
    """Full independent re-derivation of Wilder's ADX(14) in plain
    Python from the fixture's daily bars -- +DM/-DM, TR, the
    seed-then-decay smoothing, DI, DX, and the DX Wilder average --
    compared row-for-row against the operator."""
    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    out = {}
    for r in finance.adx(_events(spark)).collect():
        out[(r["symbol"], r["day"])] = r
    assert out
    syms = sorted(ev.event_type.unique())
    checked_adx = 0
    for sym in syms:
        g = ev[ev.event_type == sym].copy().sort_values(["ts", "event_id"])
        g["day"] = g.ts.dt.floor("D")
        bars = g.groupby("day").agg(
            h=("value", "max"), l=("value", "min"), c=("value", "last")
        )
        days = list(bars.index)
        h, l, c = bars.h.values, bars.l.values, bars.c.values
        n = len(days)
        if n < 15:
            continue
        trs, dps, dms = [], [], []
        for i in range(1, n):
            trs.append(max(h[i] - l[i], abs(h[i] - c[i - 1]), abs(l[i] - c[i - 1])))
            u, d = h[i] - h[i - 1], l[i - 1] - l[i]
            dps.append(u if (u > d and u > 0) else 0.0)
            dms.append(d if (d > u and d > 0) else 0.0)

        def wil(xs, t):  # t is 1-based position, t >= 14
            s = sum(xs[:14])
            for u2 in range(14, t):
                s = s - s / 14.0 + xs[u2]
            return s

        dxs = []
        for t in range(14, len(trs) + 1):
            st, sp, sm = wil(trs, t), wil(dps, t), wil(dms, t)
            dip = 100.0 * sp / st if st != 0 else None
            dim = 100.0 * sm / st if st != 0 else None
            dx = (
                100.0 * abs(dip - dim) / (dip + dim)
                if dip is not None and (dip + dim) != 0
                else None
            )
            dxs.append(dx)
            r = out[(sym, days[t])]  # bar index = t + 1 (1-based) = days[t]
            assert r["di_plus"] == pytest.approx(dip, abs=1e-5)
            assert r["di_minus"] == pytest.approx(dim, abs=1e-5)
            assert r["dx"] == pytest.approx(dx, abs=1e-5)
            assert 0.0 <= r["di_plus"] <= 100.0 + 1e-9
            assert 0.0 <= r["dx"] <= 100.0 + 1e-9
            if t >= 27:
                a = sum(dxs[:14]) / 14.0
                for x in dxs[14 : t - 13]:
                    a = (a * 13.0 + x) / 14.0
                assert r["adx"] == pytest.approx(a, abs=1e-5)
                assert 0.0 <= r["adx"] <= 100.0 + 1e-9
                checked_adx += 1
            else:
                assert r["adx"] is None
    assert checked_adx > 0, "fixture produced no full ADX windows"


def test_vpin_bounds_and_planted_toxicity(spark):
    """Fixture: VPIN in [0, 1].  Planted: a strictly rising tape is all
    buy volume -> every bucket's imbalance is 1.0 -> VPIN = 1."""
    rows = finance.vpin_toxicity(_events(spark)).collect()
    assert rows
    for r in rows:
        assert r["n_buckets"] >= 1
        assert 0.0 <= r["vpin"] <= 1.0
        assert r["vpin"] <= r["max_imbalance"] <= 1.0

    data = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "pump", 100.0 + i, '{"k": 500.0}')
        for i in range(20)
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = finance.vpin_toxicity(ev).collect()[0]
    # 10000 qty total at bucket 2000 -> >= 4 buckets; first tick has no
    # sign (contributes to neither side), every other tick is a buy
    assert r["n_buckets"] >= 4
    assert r["max_imbalance"] == 1.0
    assert r["vpin"] > 0.85  # only the seed bucket is diluted


def test_supertrend_matches_python_recursion(spark):
    """Re-derive SuperTrend(10, 3) in plain Python from the fixture's
    daily bars (band ratchet + trend flips) and compare row-for-row;
    also pins the line-equals-active-band identity."""
    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    got = {}
    for r in finance.supertrend(_events(spark)).collect():
        got[(r["symbol"], r["day"])] = r
    assert got
    for sym in sorted(ev.event_type.unique()):
        g = ev[ev.event_type == sym].copy().sort_values(["ts", "event_id"])
        g["day"] = g.ts.dt.floor("D")
        bars = g.groupby("day").agg(
            h=("value", "max"), l=("value", "min"), c=("value", "last")
        )
        days, h, l, c = list(bars.index), bars.h.values, bars.l.values, bars.c.values
        n = len(days)
        if n < 15:
            continue
        trs = [h[0] - l[0]] + [
            max(h[i] - l[i], abs(h[i] - c[i - 1]), abs(l[i] - c[i - 1]))
            for i in range(1, n)
        ]
        mids = [(h[i] + l[i]) / 2.0 for i in range(n)]
        fub = flb = dirn = None
        for t in range(10, n + 1):  # 1-based bar index
            atr = sum(trs[t - 10 : t]) / 10.0
            bub, blb = mids[t - 1] + 3.0 * atr, mids[t - 1] - 3.0 * atr
            if t == 10:
                fub, flb = bub, blb
                dirn = 1.0 if c[9] >= mids[9] else -1.0
            else:
                fub = bub if (bub < fub or c[t - 2] > fub) else fub
                flb = blb if (blb > flb or c[t - 2] < flb) else flb
                dirn = (
                    (1.0 if c[t - 1] > fub else -1.0)
                    if dirn == -1.0
                    else (-1.0 if c[t - 1] < flb else 1.0)
                )
            r = got[(sym, days[t - 1])]
            assert r["final_upper"] == pytest.approx(fub, abs=1e-5)
            assert r["final_lower"] == pytest.approx(flb, abs=1e-5)
            assert r["direction"] == dirn
            want_line = fub if dirn == -1.0 else flb
            assert r["supertrend"] == pytest.approx(want_line, abs=1e-5)


def test_hard_negatives_are_cross_label_and_truly_hardest(spark):
    """Brute-force the hardest cross-label impostor per anchor in numpy
    and check the operator's rank-1 negative matches its cosine."""
    import numpy as np

    from real_time_financial_lakehouse_spark.operators.similarity import (
        hard_negative_mining,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = hard_negative_mining(emb, n_anchors=8, k=3).collect()
    assert rows
    pdf = emb.toPandas()
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
            for r in pdf.itertuples()}
    by_anchor: dict[int, list] = {}
    for r in rows:
        assert r["negative_label"] != r["anchor_label"]
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for aid, rs in by_anchor.items():
        rs.sort(key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        q, qlab = vecs[aid]
        best = max(
            float(q @ v) / (np.linalg.norm(q) * np.linalg.norm(v))
            for vid, (v, lab) in vecs.items()
            if lab != qlab and np.linalg.norm(v) > 0
        )
        assert rs[0]["cosine"] == pytest.approx(best, abs=2e-6)


def test_split_leakage_planted_duplicates_and_clean(spark):
    from real_time_financial_lakehouse_spark.operators.similarity import (
        split_leakage_embeddings,
    )

    # all-identical corpus: every holdout vector has an exact train twin
    same = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0], 0) for i in range(100)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["verdict"]: r for r in split_leakage_embeddings(same).collect()}
    assert set(out) == {"leaky"}
    assert out["leaky"]["avg_max_cos"] == pytest.approx(1.0, abs=1e-6)

    # disjoint-direction corpus: give train-assigned ids one axis and
    # holdout-assigned ids an orthogonal one (using the operator's own
    # md5 bucket), so every cross cosine is exactly 0 -> all clean
    from pyspark.sql import functions as F

    from real_time_financial_lakehouse_spark.functions.hashing import md5_long

    tag = same.select(
        "vec_id",
        (md5_long(F.concat_ws(":", F.lit("split"), F.col("vec_id"))) % 100 < 80)
        .alias("is_train"),
    ).collect()
    train_ids = {r["vec_id"] for r in tag if r["is_train"]}
    disjoint = spark.createDataFrame(
        [
            (
                i,
                [1.0, 0.0, 0.0, 0.0] if i in train_ids else [0.0, 0.0, 0.0, 1.0],
                0,
            )
            for i in range(100)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out2 = {r["verdict"]: r for r in split_leakage_embeddings(disjoint).collect()}
    assert set(out2) == {"clean"}
    assert out2["clean"]["max_max_cos"] == pytest.approx(0.0, abs=1e-9)
    # the two verdict buckets always partition the full holdout set
    fixture = load_table(spark, SF_SMOKE, "embeddings")
    summary = split_leakage_embeddings(fixture).collect()
    n_total = sum(r["n_holdout"] for r in summary)
    tag2 = (
        fixture.select(
            (md5_long(F.concat_ws(":", F.lit("split"), F.col("vec_id"))) % 100 < 80)
            .alias("is_train")
        )
        .collect()
    )
    assert n_total == len([r for r in tag2 if not r["is_train"]])


def test_streaming_vpin_survives_mid_bucket_batch_split(spark, tmp_path):
    """A volume bucket straddles two micro-batches: the open bucket's
    partials must carry across the boundary and the final summary must
    equal the batch twin exactly."""
    import os

    from real_time_financial_lakehouse_spark.streaming.stateful import vpin_stream

    def mk(eid, sec, v, q):
        return (eid, dt.datetime(2024, 1, 1, 0, 0, sec), 1, "s", v, f'{{"k": {q}}}')

    # bucket qty = 2000: file A ends mid-bucket-1 (cum 2900), file B
    # finishes it and opens bucket 2
    f1 = [mk(0, 0, 100.0, 900.0), mk(1, 1, 101.0, 1100.0), mk(2, 2, 100.5, 900.0)]
    f2 = [mk(3, 3, 102.0, 900.0), mk(4, 4, 101.5, 1200.0), mk(5, 5, 103.0, 500.0)]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(src / "b"))
    for sub, mt in (("a", 1_000_000_000), ("b", 2_000_000_000)):
        for f in (src / sub).glob("*.parquet"):
            os.utime(f, (mt, mt))

    out_rows, batches = [], []

    def _collect(batch_df, batch_id):
        rows = batch_df.collect()
        if rows:
            batches.append(batch_id)
            out_rows.extend(rows)

    prepped = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        vpin_stream(prepped)
        .writeStream.foreachBatch(_collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(batches) >= 2
    final = max(out_rows, key=lambda r: r["total_qty_raw"])
    ev = spark.createDataFrame(f1 + f2, schema)
    batch = finance.vpin_toxicity(ev).collect()[0]
    assert final["n_buckets"] == batch["n_buckets"]
    assert final["total_qty_raw"] == pytest.approx(5500.0, abs=1e-9)
    assert final["vpin_raw"] == pytest.approx(batch["vpin"], abs=1e-6)
    assert final["max_imb_raw"] == pytest.approx(batch["max_imbalance"], abs=1e-6)


def test_round8_ops_degenerate_inputs(spark):
    """Constant prices, too-short series, and empty frames must degrade
    per each operator's stated convention -- not throw under ANSI mode."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    # constant-price tape: MFI window moves nothing -> NULL; VPIN never
    # signs a tick -> imbalance 0; EWMA vol of zero returns -> 0
    const = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1 + i // 2, 0, i % 2), 1, "c", 50.0, '{"k": 300.0}')
            for i in range(40)
        ],
        schema,
    )
    mfi_rows = finance.mfi(const, n=14).collect()
    assert mfi_rows and all(r["mfi"] is None for r in mfi_rows)
    vpin_row = finance.vpin_toxicity(const).collect()[0]
    assert vpin_row["vpin"] == 0.0  # all volume unsigned -> |0-0|/v
    ewma = finance.ewma_riskmetrics_vol(const).collect()[0]
    assert ewma["ewma_vol_daily"] == 0.0

    # series shorter than the warm-up: ADX/supertrend (need >= 15 days),
    # aroon (full 11-bar window) emit nothing; kalman needs >= 2 days
    short = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i), 1, "s", 10.0 + i, "{}") for i in range(5)],
        schema,
    )
    assert finance.adx(short).count() == 0
    assert finance.supertrend(short).count() == 0
    assert finance.aroon(short, n=10).count() == 0
    one_day = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 1, "o", 10.0, "{}")], schema
    )
    assert finance.kalman_price_smooth(one_day).count() == 0

    # empty input: every round-8 operator returns an empty frame
    empty = spark.createDataFrame([], schema)
    for fn in (
        lambda d: finance.mfi(d, n=14),
        lambda d: finance.aroon(d, n=10),
        finance.min_variance_portfolio,
        finance.bs_greeks,
        finance.keltner_channels,
        finance.ewma_riskmetrics_vol,
        finance.kalman_price_smooth,
        finance.adx,
        finance.supertrend,
        finance.vpin_toxicity,
    ):
        assert fn(empty).count() == 0

    # single-label embeddings: hard negatives have no cross-label pool
    from real_time_financial_lakehouse_spark.operators.similarity import (
        hard_negative_mining,
    )

    mono = spark.createDataFrame(
        [(i, [1.0, float(i)], 0) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    assert hard_negative_mining(mono).count() == 0


def test_almgren_chriss_boundary_and_frontloading(spark):
    rows = finance.almgren_chriss_schedule(_events(spark)).collect()
    assert rows
    by_sym: dict[str, list] = {}
    for r in rows:
        by_sym.setdefault(r["symbol"], []).append(r)
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: r["slice_id"])
        assert rs[0]["remaining_shares"] == pytest.approx(1_000_000.0, abs=1e-3)
        assert rs[-1]["remaining_shares"] == pytest.approx(0.0, abs=1e-6)
        rem = [r["remaining_shares"] for r in rs]
        assert rem == sorted(rem, reverse=True)
        trades = [r["slice_trade"] for r in rs[1:]]
        assert sum(trades) == pytest.approx(1_000_000.0, abs=1e-2)
        assert all(t >= -1e-9 for t in trades)
        if rs[0]["kappa"] > 0:
            # risk-averse schedules trade hardest first
            assert trades[0] > trades[-1]


def test_spearman_ic_perfect_momentum_is_one(spark):
    """Planted: four symbols with distinct constant growth rates -- the
    cross-sectional return ranking never changes, so yesterday's rank
    predicts today's perfectly and IC = 1 every day."""
    from real_time_financial_lakehouse_spark.operators.finance import spearman_ic_daily

    data = []
    eid = 0
    for si, g in enumerate((1.01, 1.02, 1.03, 1.04)):
        px = 100.0
        for d in range(8):
            px *= g
            data.append((eid, dt.datetime(2024, 1, 1 + d), 1, f"s{si}", px, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = spearman_ic_daily(ev).collect()
    assert rows
    for r in rows:
        assert r["n_assets"] == 4
        assert r["ic"] == pytest.approx(1.0, abs=1e-6)
    # fixture sanity: IC stays in [-1, 1]
    for r in finance.spearman_ic_daily(_events(spark)).collect():
        if r["ic"] is not None:
            assert -1.0 - 1e-6 <= r["ic"] <= 1.0 + 1e-6


def test_dp_noise_matches_hashlib_inverse_cdf(spark):
    import hashlib

    from real_time_financial_lakehouse_spark.operators.profiling import dp_noise_counts

    rows = dp_noise_counts(_events(spark)).collect()
    assert rows
    for r in rows:
        hv = int(hashlib.md5(f"dp:{r['event_type']}".encode()).hexdigest()[:15], 16)
        u = ((hv % 1048576) + 0.5) / 1048576.0
        want = -1.0 * math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert r["laplace_noise"] == pytest.approx(want, abs=2e-6)
        assert r["released_count"] == pytest.approx(
            r["true_count"] + want, abs=2e-6
        )
        assert r["epsilon"] == 1.0
