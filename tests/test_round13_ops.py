"""Round-13 additions: retrieval-quality audits (ann_recall_curve,
rank_biased_overlap), the intra_label_cosine_dispersion headroom guard
and raw-double path, and plan pins for the new shapes.

The referee for the retrieval audits is a full NUMPY re-implementation
of both rankers (exact brute-force cosine AND the hyperplane-LSH
band/candidate/rerank pipeline) -- independent of both Spark and the
DuckDB oracle, so a shared misconception between the twins cannot hide.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.operators import similarity

from conftest import SF_SMOKE

N_QUERIES = 8
DEPTH = 10


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def ref_ranks():
    """Numpy referee: (exact_ranks, ann_ranks) as dicts
    query_id -> [neighbor_id in rank order, depth-truncated]."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    ids = sorted(vecs)
    norms = {i: math.sqrt(float(np.dot(vecs[i], vecs[i]))) for i in ids}

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    def cosine(a: int, b: int) -> float:
        d = norms[a] * norms[b]
        return q6(float(np.dot(vecs[a], vecs[b])) / d) if d != 0 else 0.0

    exact = {}
    for q in range(N_QUERIES):
        scored = sorted(
            ((-cosine(q, n), n) for n in ids if n != q)
        )[:DEPTH]
        exact[q] = [n for _, n in scored]

    # hyperplane-LSH side: same md5 matrix, same sign quantization
    H = np.asarray(similarity.hyperplane_matrix(), dtype=np.float64)
    rows = similarity.HP_BITS // similarity.HP_BANDS

    def bands_of(i: int):
        dots = H @ vecs[i]
        bits = [1 if math.floor(d * 1e6 + 0.5) >= 0 else 0 for d in dots]
        return tuple(
            sum(bits[j * rows + r] << r for r in range(rows))
            for j in range(similarity.HP_BANDS)
        )

    sig = {i: bands_of(i) for i in ids}
    ann = {}
    for q in range(N_QUERIES):
        cands = {
            n for n in ids
            if n != q and any(sig[q][j] == sig[n][j]
                              for j in range(similarity.HP_BANDS))
        }
        scored = sorted(((-cosine(q, n), n) for n in cands))[:DEPTH]
        ann[q] = [n for _, n in scored]
    return exact, ann


def test_recall_curve_matches_numpy_referee(spark, ref_ranks):
    exact, ann = ref_ranks
    got = {
        int(r.k): r
        for r in similarity.ann_recall_curve(
            load_table(spark, SF_SMOKE, "embeddings")
        ).collect()
    }
    for k in (1, 3, 5, 10):
        hits = [len(set(exact[q][:k]) & set(ann[q][:k]))
                for q in range(N_QUERIES)]
        row = got[k]
        assert row.n_queries == N_QUERIES
        assert row.mean_recall == pytest.approx(
            sum(hits) / (N_QUERIES * k), abs=1e-6
        ), k
        assert row.min_recall == pytest.approx(min(hits) / k, abs=1e-6)
        assert row.n_perfect == sum(1 for h in hits if h == k)


def test_rbo_matches_numpy_referee(spark, ref_ranks):
    exact, ann = ref_ranks
    picos = similarity.rbo_weight_picos()
    got = {
        int(r.query_id): r
        for r in similarity.rank_biased_overlap(
            load_table(spark, SF_SMOKE, "embeddings")
        ).collect()
    }
    assert sorted(got) == list(range(N_QUERIES))
    for q in range(N_QUERIES):
        er = {n: i + 1 for i, n in enumerate(exact[q])}
        ar = {n: i + 1 for i, n in enumerate(ann[q])}
        common = set(er) & set(ar)
        rbo_pico = sum(picos[max(er[n], ar[n]) - 1] for n in common)
        row = got[q]
        assert row.n_common == len(common), q
        assert row.overlap_at_depth == pytest.approx(len(common) / DEPTH)
        assert row.rbo_trunc == pytest.approx(rbo_pico / 1e12, abs=1e-6)


def test_rbo_bounds_and_cross_consistency(spark):
    """rbo_trunc lives in [0, 1 - p^depth] (the truncated-RBO ceiling,
    attained only by identical lists); and the two audits must agree:
    sum of n_common over probes == mean_recall@10 * 10 * n_queries."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rbo = similarity.rank_biased_overlap(emb).collect()
    ceiling = 1.0 - similarity.RBO_P ** similarity.RBO_DEPTH
    for r in rbo:
        assert 0.0 <= r.rbo_trunc <= ceiling + 1e-9
        assert 0.0 <= r.overlap_at_depth <= 1.0
        # RBO is top-weighted: it can exceed flat overlap only when the
        # ceiling does, never 1.0
        assert r.rbo_trunc <= 1.0
    curve = {int(r.k): r for r in similarity.ann_recall_curve(emb).collect()}
    total_common = sum(r.n_common for r in rbo)
    assert curve[10].mean_recall == pytest.approx(
        total_common / (len(rbo) * 10), abs=1e-6
    )


def test_identical_lists_hit_rbo_ceiling(spark):
    """Degenerate referee: when every probe's ANN list equals its exact
    list (weights sum over md = rank), the RBO weight table must sum to
    exactly the 1 - p^depth ceiling on the pico grid."""
    picos = similarity.rbo_weight_picos()
    ceiling_pico = sum(picos)
    expect = math.floor(
        (1.0 - similarity.RBO_P ** similarity.RBO_DEPTH) * 1e12 + 0.5
    )
    # per-entry flooring can shed at most depth/2 picos vs flooring the sum
    assert abs(ceiling_pico - expect) <= similarity.RBO_DEPTH


def test_retrieval_audit_plans(spark):
    """Audit joins stay broadcast (the rank frames are Q x depth bounded
    regardless of corpus size): no sort-merge, no cartesian, no Python."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    for df in (
        similarity.ann_recall_curve(emb),
        similarity.rank_biased_overlap(emb),
    ):
        plan = _plan(df)
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "BroadcastExchange" in plan


def test_hp_topk_unchanged_by_refactor(spark):
    """ann_hyperplane_topk must return exactly hp_ranked cut at k --
    the shipped retriever and the audited retriever are the same frame."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = similarity.ann_hyperplane_topk(emb).collect()
    b = (
        similarity.hp_ranked(emb)
        .filter(F.col("rank") <= 3)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert a == b


def test_dispersion_guard_raises_past_headroom(spark):
    big = spark.range(similarity._PICO_GRID_MAX_VECS + 1).select(
        F.col("id").alias("vec_id"),
        F.lit("L").alias("label"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(Exception, match="pico-grid headroom"):
        similarity.intra_label_cosine_dispersion(big).collect()
    # the double path handles the same frame: n identical unit vectors
    # have mean pairwise cosine exactly 1
    row = similarity.intra_label_cosine_dispersion(big, exact=False).collect()
    assert len(row) == 1
    assert row[0].mean_pairwise_cosine == pytest.approx(1.0, abs=1e-6)


def test_dispersion_double_path_matches_exact(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = {r.label: r for r in
         similarity.intra_label_cosine_dispersion(emb).collect()}
    b = {r.label: r for r in
         similarity.intra_label_cosine_dispersion(emb, exact=False).collect()}
    assert sorted(a) == sorted(b)
    for lab, ra in a.items():
        rb = b[lab]
        assert ra.n_vecs == rb.n_vecs
        assert ra.mean_pairwise_cosine == pytest.approx(
            rb.mean_pairwise_cosine, abs=2e-6
        )
        assert ra.centroid_norm == pytest.approx(rb.centroid_norm, abs=2e-6)


def test_ivf_nprobe_curve_certificates_hold_in_numpy(spark):
    """Independent referee for ivf_nprobe_recall_curve: re-run the IVF
    search in numpy from the SAME fitted codebook (centers are data, not
    code) for every nprobe cut and check the certificate CLAIMS are true
    facts -- recall is monotone in nprobe and clears 0.6 at nprobe=6 --
    not just that the engine emitted TRUE."""
    emb_df = load_table(spark, SF_SMOKE, "embeddings")
    model = similarity.fit_codebook(emb_df, cache_key=SF_SMOKE)
    centers = np.asarray(
        [[float(x) for x in c] for c in model.clusterCenters()]
    )
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    ids = sorted(vecs)
    norms = {i: math.sqrt(float(np.dot(vecs[i], vecs[i]))) for i in ids}

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def cosine(a, b):
        d = norms[a] * norms[b]
        return q6(float(np.dot(vecs[a], vecs[b])) / d) if d != 0 else 0.0

    cell = {i: int(np.argmin(((centers - vecs[i]) ** 2).sum(axis=1)))
            for i in ids}
    NQ, K = 5, 5
    exact = {
        q: {n for _, n in sorted(
            ((-cosine(q, n), n) for n in ids if n != q))[:K]}
        for q in range(NQ)
    }
    n_exact = sum(len(v) for v in exact.values())
    recalls = []
    for p in (1, 2, 4, 6):
        hits = 0
        for q in range(NQ):
            d2 = ((centers - vecs[q]) ** 2).sum(axis=1)
            probe = set(np.lexsort((np.arange(len(d2)), d2))[:p])
            cand = [n for n in ids if n != q and cell[n] in probe]
            top = {n for _, n in sorted(
                ((-cosine(q, n), n) for n in cand))[:K]}
            hits += len(top & exact[q])
        recalls.append(hits / n_exact)
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] >= 0.6, recalls
    # and the engine's certificate row set matches the protocol
    got = similarity.ivf_nprobe_recall_curve(emb_df, model).collect()
    assert [int(r.nprobe) for r in got] == [1, 2, 4, 6]
    assert all(r.monotone_ok and r.gate_ok for r in got)
    assert all(int(r.n_exact_pairs) == n_exact for r in got)


# ---------------------------------------------------------------------------
# streaming_label_centroids
# ---------------------------------------------------------------------------


def test_streaming_label_centroids_matches_numpy_grid_referee(spark, sf_dir):
    """Referee: full numpy re-implementation of the grid-sum centroid
    (exact int64 1e-8-grid sums / read-time double projection),
    independent of Spark, the streaming machinery, and the DuckDB
    oracle -- then drained state must match it bit-for-bit."""
    from real_time_financial_lakehouse_spark.streaming.silver import (
        streaming_label_centroids,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    expected = {}
    for label, g in emb.groupby("label"):
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        gsum = np.floor(mat * 1e8 + 0.5).astype(np.int64).sum(axis=0)
        n = mat.shape[0]
        m = gsum.astype(np.float64) / (float(n) * 1e8)
        q = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        expected[int(label)] = (
            n,
            q(math.sqrt(float((m * m).sum()))),
            *[q(float(m[i])) for i in range(4)],
        )

    rows = streaming_label_centroids(spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        exp = expected[int(r.label)]
        got = (r.n_vectors, r.centroid_norm, r.c0, r.c1, r.c2, r.c3)
        assert got == exp, (r.label, got, exp)


def test_streaming_label_centroids_tracks_batch_twin(spark, sf_dir):
    """The grid twin and the float-mean batch profile may differ only by
    the 0.5e-8 component quantization -- i.e. at most one 1e-6 output
    grid step after qround."""
    from real_time_financial_lakehouse_spark.streaming.silver import (
        streaming_label_centroids,
    )

    emb_df = load_table(spark, sf_dir, "embeddings")
    batch = {r.label: r for r in similarity.label_centroids(emb_df).collect()}
    for r in streaming_label_centroids(spark, sf_dir).collect():
        b = batch[r.label]
        assert r.n_vectors == b.n_vectors
        for col in ("centroid_norm", "c0", "c1", "c2", "c3"):
            assert abs(r[col] - b[col]) <= 1.0000001e-6, (r.label, col)


# ---------------------------------------------------------------------------
# mmr_diversified_topk
# ---------------------------------------------------------------------------


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _mmr_referee(sf_dir, n_queries=8, n_candidates=20, k=8):
    """Full numpy/python re-implementation of the greedy MMR selection,
    independent of Spark and the DuckDB oracle."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    ids = sorted(vecs)

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        na, nb = math.sqrt(float(va @ va)), math.sqrt(float(vb @ vb))
        return _q6(float(va @ vb) / (na * nb)) if na * nb != 0 else 0.0

    out = []
    for q in [i for i in ids if i < n_queries]:
        cands = sorted(((cos(q, c), c) for c in ids if c != q),
                       key=lambda t: (-t[0], t[1]))[:n_candidates]
        sel = []
        for step in range(1, k + 1):
            best = None
            for rel, c in cands:
                if any(c == s[2] for s in sel):
                    continue
                maxsim = max((cos(c, s[2]) for s in sel), default=0.0)
                score = 0.7 * rel - 0.3 * maxsim
                if best is None or score > best[0] or (
                    score == best[0] and c < best[1][2]
                ):
                    best = (score, (step, rel, c))
            sel.append(best[1])
            out.append((q, best[1][0], best[1][2], best[1][1], _q6(best[0])))
    return out


def test_mmr_diversified_topk_matches_numpy_referee(spark, sf_dir):
    emb_df = load_table(spark, sf_dir, "embeddings")
    got = [
        (r.query_id, r.rank, r.doc_id, r.relevance, r.mmr_score)
        for r in similarity.mmr_diversified_topk(emb_df).collect()
    ]
    assert got == _mmr_referee(sf_dir)


def test_mmr_selection_is_more_diverse_than_pure_topk(spark, sf_dir):
    """The point of the operator: the MMR set's mean pairwise cosine
    must not exceed pure relevance top-k's, and the selections must
    actually differ somewhere (the penalty is doing work)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        return float(va @ vb) / (
            math.sqrt(float(va @ va)) * math.sqrt(float(vb @ vb))
        )

    def mean_pairwise(sel):
        ps = [cos(a, b) for i, a in enumerate(sel) for b in sel[i + 1:]]
        return sum(ps) / len(ps)

    emb_df = load_table(spark, sf_dir, "embeddings")
    mmr_sel = {}
    for r in similarity.mmr_diversified_topk(emb_df).collect():
        mmr_sel.setdefault(r.query_id, []).append(r.doc_id)
    topk_sel = {}
    for r in similarity.cosine_topk(emb_df, n_queries=8, k=8).collect():
        topk_sel.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(mmr_sel) == set(topk_sel)
    diffs = 0
    for q in mmr_sel:
        assert mean_pairwise(mmr_sel[q]) <= mean_pairwise(topk_sel[q]) + 1e-9, q
        diffs += mmr_sel[q] != topk_sel[q]
    assert diffs > 0


def test_mmr_plan_has_no_cartesian_and_broadcasts_queries(spark, sf_dir):
    emb_df = load_table(spark, sf_dir, "embeddings")
    plan = _plan(similarity.mmr_diversified_topk(emb_df))
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


# ---------------------------------------------------------------------------
# component_var_decomposition
# ---------------------------------------------------------------------------


def test_component_var_euler_identity_and_numpy_referee(spark, sf_dir):
    """Referee: numpy covariance on the complete panel; and the Euler
    identity -- component VaRs sum to z * sigma_p -- which only holds if
    the covariance stage really used one coherent Gram matrix."""
    from real_time_financial_lakehouse_spark.operators.finance import (
        _daily_log_returns,
        component_var_decomposition,
    )

    ev = load_table(spark, sf_dir, "events")
    rets = _daily_log_returns(ev).toPandas()
    piv = rets.pivot(index="day", columns="symbol", values="lr").dropna()
    syms = sorted(piv.columns)
    mat = piv[syms].to_numpy(dtype=np.float64)
    cov = np.cov(mat, rowvar=False, bias=True)
    n = len(syms)
    w = np.full(n, 1.0 / n)
    port_var = float(w @ cov @ w)
    sig_p = math.sqrt(port_var)
    rows = {r.symbol: r for r in component_var_decomposition(ev).collect()}
    assert set(rows) == set(syms)
    comp_sum = 0.0
    for i, s in enumerate(syms):
        r = rows[s]
        assert r.n_days == mat.shape[0]
        assert r.daily_vol == pytest.approx(math.sqrt(cov[i, i]), rel=1e-6)
        mvar = 1.645 * float(cov[i] @ w) / sig_p
        assert r.marginal_var == pytest.approx(mvar, rel=1e-6)
        assert r.component_var == pytest.approx(mvar / n, rel=1e-6)
        assert r.risk_share == pytest.approx(
            float(cov[i] @ w) / (n * port_var), rel=1e-5
        )
        comp_sum += r.component_var
    assert comp_sum == pytest.approx(1.645 * sig_p, rel=1e-6)
    shares = sum(r.risk_share for r in rows.values())
    assert shares == pytest.approx(1.0, abs=1e-5)


# ---------------------------------------------------------------------------
# epps_effect_curve
# ---------------------------------------------------------------------------


def test_epps_effect_curve_matches_pandas_referee(spark, sf_dir):
    """Referee: pandas bars + numpy Pearson at every interval."""
    from real_time_financial_lakehouse_spark.operators.finance import (
        epps_effect_curve,
    )

    ev = load_table(spark, sf_dir, "events")
    pdf = ev.filter(F.col("value") > 0).select(
        "event_type", "ts", "event_id", "value"
    ).toPandas()
    got = {}
    for r in epps_effect_curve(ev).collect():
        got[(r.interval_min, r.sym_a, r.sym_b)] = (r.n_obs, r.corr)
    q12 = lambda x: math.floor(x * 1e12 + 0.5) / 1e12
    checked = 0
    for m in (1, 5, 15, 30):
        pdf2 = pdf.copy()
        pdf2["bucket"] = (pdf2["ts"].astype("int64") // 1000) // (60 * m * 10**6)
        pdf2 = pdf2.sort_values(["ts", "event_id"])
        bars = pdf2.groupby(["event_type", "bucket"])["value"].last()
        series = {}
        for sym in sorted(pdf2["event_type"].unique()):
            s = bars[sym]
            lr = {b: q12(math.log(s[b] / s[pb]))
                  for b, pb in zip(s.index[1:], s.index[:-1])}
            series[sym] = lr
        syms = sorted(series)
        for i, sa in enumerate(syms):
            for sb in syms[i + 1:]:
                common = sorted(set(series[sa]) & set(series[sb]))
                if not common:
                    assert (m, sa, sb) not in got
                    continue
                xa = np.array([series[sa][b] for b in common])
                xb = np.array([series[sb][b] for b in common])
                n_obs, corr = got[(m, sa, sb)]
                assert n_obs == len(common), (m, sa, sb)
                if xa.std() * xb.std() == 0:
                    assert corr is None
                else:
                    ref = float(np.cov(xa, xb, bias=True)[0, 1]) / (
                        xa.std() * xb.std()
                    )
                    assert corr == pytest.approx(ref, abs=2e-6), (m, sa, sb)
                checked += 1
    assert checked >= 10


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------


def test_hill_tail_index_matches_numpy_referee(spark, sf_dir):
    from real_time_financial_lakehouse_spark.operators.finance import (
        _daily_log_returns,
        hill_tail_index,
    )

    ev = load_table(spark, sf_dir, "events")
    rets = _daily_log_returns(ev).toPandas()
    got = {r.symbol: r for r in hill_tail_index(ev).collect()}
    for sym, g in rets.groupby("symbol"):
        xs = np.sort(np.abs(g["lr"].to_numpy(dtype=np.float64)))[::-1]
        xs = xs[xs > 0]
        n = len(xs)
        if n < 9:
            assert sym not in got
            continue
        k = min(20, n // 4)
        hill = float(np.log(xs[:k]).sum()) / k - math.log(xs[k])
        r = got[sym]
        assert r.n_days == n and r.k_tail == k
        assert r.hill == pytest.approx(hill, abs=2e-6)
        assert r.alpha_tail == pytest.approx(1.0 / hill, rel=1e-5)
        assert r.hill_se == pytest.approx(hill / math.sqrt(k), abs=2e-6)


# ---------------------------------------------------------------------------
# heaps_law_fit
# ---------------------------------------------------------------------------


def test_heaps_law_fit_matches_pandas_referee(spark, sf_dir):
    import re as _re

    from real_time_financial_lakehouse_spark.operators.text import heaps_law_fit

    docs = load_table(spark, sf_dir, "documents")
    pdf = docs.select("doc_id", "text").toPandas()
    lo, hi = int(pdf["doc_id"].min()), int(pdf["doc_id"].max())
    firsts = {}
    for r in pdf.itertuples():
        for t in _re.split("[^a-z]+", r.text.lower()):
            if len(t) >= 1 and (t not in firsts or r.doc_id < firsts[t]):
                firsts[t] = r.doc_id
    expected = []
    for i in range(1, 11):
        t = float(lo) + (float(i) / 10.0) * float(hi - lo)
        n_docs = int((pdf["doc_id"].astype(float) <= t).sum())
        vocab = sum(1 for d in firsts.values() if float(d) <= t)
        expected.append((i * 10, n_docs, vocab))
    pts = [(e[1], e[2]) for e in expected if e[1] > 0 and e[2] > 0]
    xs = np.log([p[0] for p in pts]); ys = np.log([p[1] for p in pts])
    vx = xs.var()
    beta = float(np.cov(xs, ys, bias=True)[0, 1]) / vx if vx else None
    rows = heaps_law_fit(docs).collect()
    assert [(r.pct_range, r.n_docs, r.vocab_size) for r in rows] == expected
    for r in rows:
        if beta is None:
            assert r.heaps_beta is None
        else:
            assert r.heaps_beta == pytest.approx(beta, abs=2e-6)
            k = math.exp(float(ys.mean()) - beta * float(xs.mean()))
            assert r.heaps_k == pytest.approx(k, rel=1e-5)
    # growth curve is monotone non-decreasing by construction
    vs = [r.vocab_size for r in rows]
    assert all(b >= a for a, b in zip(vs, vs[1:]))


# ---------------------------------------------------------------------------
# query_likelihood_search
# ---------------------------------------------------------------------------


def test_query_likelihood_matches_direct_formula_referee(spark, sf_dir):
    """Referee scores with the DIRECT Dirichlet form
    sum_q ln((tf + mu p_q) / (dl + mu)) -- not the postings-only
    decomposition the engine uses -- so the algebraic identity is
    itself under test."""
    import re as _re
    from collections import Counter

    from real_time_financial_lakehouse_spark.operators.text import (
        BM25_QUERY_TERMS,
        QL_MU,
        query_likelihood_search,
    )

    docs = load_table(spark, sf_dir, "documents")
    pdf = docs.select("doc_id", "text").toPandas()
    toks = {
        int(r.doc_id): [
            t for t in _re.split("[^a-z]+", r.text.lower()) if len(t) >= 3
        ]
        for r in pdf.itertuples()
    }
    c_total = sum(len(v) for v in toks.values())
    cf = Counter(t for v in toks.values() for t in v if t in BM25_QUERY_TERMS)
    q_live = [t for t in BM25_QUERY_TERMS if cf[t] > 0]
    scores = {}
    for d, v in toks.items():
        tf = Counter(t for t in v if t in q_live)
        if not tf:
            continue
        dl = len(v)
        s = sum(
            math.log((tf[q] + QL_MU * (cf[q] / c_total)) / (dl + QL_MU))
            for q in q_live
        )
        scores[d] = (len(tf), dl, math.floor(s * 1e6 + 0.5) / 1e6)
    expected = sorted(
        ((v[2], -d) for d, v in scores.items()), reverse=True
    )[:20]
    expected = [(-nd, scores[-nd]) for _, nd in expected]
    got = query_likelihood_search(docs).collect()
    assert len(got) == min(20, len(scores))
    for r, (d, (nm, dl, sc)) in zip(got, expected):
        assert r.doc_id == d
        assert r.n_matched_terms == nm and r.dl == dl
        assert r.ql_score == pytest.approx(sc, abs=2e-6)


# ---------------------------------------------------------------------------
# late round-13 batch: permutation_entropy, granger_causality_pairs,
# pacf_durbin_levinson, lexical_richness
# ---------------------------------------------------------------------------


def _pandas_dclose(spark, sf_dir):
    """Pandas referee for the shared daily-close frame: last tick per
    (symbol, day) by the (ts, event_id) key, positive ticks only."""
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev[ev["value"] > 0].copy()
    ev["day"] = ev["ts"].dt.floor("D")
    ev = ev.sort_values(["event_type", "day", "ts", "event_id"])
    last = ev.groupby(["event_type", "day"], as_index=False).last()
    return last.rename(columns={"event_type": "symbol", "value": "c"})[
        ["symbol", "day", "c"]
    ]


def test_permutation_entropy_matches_python_referee(spark, sf_dir):
    from real_time_financial_lakehouse_spark.operators.finance import (
        permutation_entropy,
    )

    ev = load_table(spark, sf_dir, "events")
    got = {r.symbol: r for r in permutation_entropy(ev).collect()}
    dclose = _pandas_dclose(spark, sf_dir)
    from collections import Counter

    for sym, g in dclose.groupby("symbol"):
        cs = g.sort_values("day")["c"].to_list()
        pats = Counter()
        for a, b, z in zip(cs, cs[1:], cs[2:]):
            # stable ascending sort; earlier index wins ties
            order = sorted(range(3), key=lambda i: ([a, b, z][i], i))
            pats["".join(str(i) for i in order)] += 1
        n = sum(pats.values())
        if n < 30:
            assert sym not in got
            continue
        h = -sum((c / n) * math.log(c / n) for c in pats.values())
        r = got[sym]
        assert r.n_windows == n
        assert r.n_patterns == len(pats)
        assert r.perm_entropy == pytest.approx(h / math.log(6.0), abs=2e-6)
        assert r.max_pattern_share == pytest.approx(
            max(pats.values()) / n, abs=2e-6
        )


def test_granger_f_matches_numpy_lstsq_referee(spark, sf_dir):
    """Referee solves both OLS systems with np.linalg.lstsq and builds F
    from actual residuals -- a method independent of the closed-form
    centered-sum algebra shared by the engine and the oracle."""
    from real_time_financial_lakehouse_spark.operators.finance import (
        _daily_log_returns,
        granger_causality_pairs,
    )

    ev = load_table(spark, sf_dir, "events")
    rets = _daily_log_returns(ev).toPandas()
    got = {
        (r.sym_cause, r.sym_effect): r
        for r in granger_causality_pairs(ev).collect()
    }
    frames = {}
    for sym, g in rets.groupby("symbol"):
        g = g.sort_values("day").reset_index(drop=True)
        g["r1"] = g["lr"].shift(1)
        frames[sym] = g.dropna(subset=["r1"]).set_index("day")
    syms = sorted(frames)
    n_checked = 0
    for sx in syms:
        for sy in syms:
            if sx == sy:
                continue
            j = frames[sy].join(
                frames[sx][["r1"]], how="inner", rsuffix="_x"
            )
            n = len(j)
            # engine eligibility: the family-wide n_days >= 20 convention
            if n < 20:
                assert (sx, sy) not in got
                continue
            y = j["lr"].to_numpy(dtype=np.float64)
            u = j["r1"].to_numpy(dtype=np.float64)
            v = j["r1_x"].to_numpy(dtype=np.float64)
            one = np.ones(n)
            br, *_ = np.linalg.lstsq(np.column_stack([one, u]), y, rcond=None)
            rss_r = float(((y - np.column_stack([one, u]) @ br) ** 2).sum())
            bu, *_ = np.linalg.lstsq(
                np.column_stack([one, u, v]), y, rcond=None
            )
            rss_u = float(((y - np.column_stack([one, u, v]) @ bu) ** 2).sum())
            if rss_u <= 0:
                continue
            f_ref = (rss_r - rss_u) * (n - 3) / rss_u
            r = got[(sx, sy)]
            assert r.n_days == n
            assert r.f_stat == pytest.approx(f_ref, abs=5e-3)
            n_checked += 1
    assert n_checked >= 6


def test_pacf_matches_yule_walker_solve_referee(spark, sf_dir):
    """Referee computes the ACF in plain floating point and extracts
    phi_kk as the last component of the Yule-Walker SOLVE (np.linalg,
    Toeplitz system) -- independent of the Durbin-Levinson recursion the
    engine and the oracle share."""
    from real_time_financial_lakehouse_spark.operators.finance import (
        _daily_log_returns,
        pacf_durbin_levinson,
    )

    ev = load_table(spark, sf_dir, "events")
    rets = _daily_log_returns(ev).toPandas()
    got = {r.symbol: r for r in pacf_durbin_levinson(ev).collect()}
    for sym, g in rets.groupby("symbol"):
        x = g.sort_values("day")["lr"].to_numpy(dtype=np.float64)
        n = len(x)
        if n < 20:
            assert sym not in got
            continue
        d = x - x.mean()
        den = float((d * d).sum())
        acf = [float((d[k:] * d[:-k]).sum()) / den for k in range(1, 6)]
        r = got[sym]
        for k in range(1, 6):
            rho = np.asarray([1.0] + acf, dtype=np.float64)
            R = np.asarray([[rho[abs(i - j)] for j in range(k)] for i in range(k)])
            phi_kk = float(np.linalg.solve(R, rho[1 : k + 1])[-1])
            assert getattr(r, f"pacf_{k}") == pytest.approx(
                phi_kk, abs=5e-4
            ), (sym, k)


def test_lexical_richness_matches_python_counter_referee(spark, sf_dir):
    import re
    from collections import Counter

    from real_time_financial_lakehouse_spark.operators.text import (
        lexical_richness,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {r.source: r for r in lexical_richness(docs).collect()}
    pdocs = docs.select("source", "text").toPandas()
    for src, g in pdocs.groupby("source"):
        c = Counter()
        for t in g["text"]:
            c.update(w for w in re.split("[^a-z]+", t.lower()) if w)
        n = sum(c.values())
        if n < 2:
            assert src not in got
            continue
        v = len(c)
        s2 = sum(x * x for x in c.values())
        r = got[src]
        assert r.n_tokens == n and r.n_types == v
        assert r.yule_k == pytest.approx(1e4 * (s2 - n) / (n * n), abs=1e-3)
        assert r.simpson_d == pytest.approx(
            (s2 - n) / (n * (n - 1)), abs=1e-7
        )
        assert r.herdan_c == pytest.approx(
            math.log(v) / math.log(n), abs=2e-6
        )


def test_granger_and_perm_entropy_plans(spark, sf_dir):
    from real_time_financial_lakehouse_spark.operators.finance import (
        granger_causality_pairs,
        permutation_entropy,
    )

    ev = load_table(spark, sf_dir, "events")
    gp = _plan(granger_causality_pairs(ev))
    assert "CartesianProduct" not in gp and "BatchEvalPython" not in gp
    # the pair join must be the day-keyed equi-join, not a broadcast NL
    assert "SortMergeJoin" in gp or "ShuffledHashJoin" in gp or "BroadcastHashJoin" in gp
    pe = _plan(permutation_entropy(ev))
    assert "BatchEvalPython" not in pe and "CartesianProduct" not in pe


def test_rolling_vol_chunking_is_exact(spark, sf_dir):
    """The round-13 chunked rolling-stddev formulation (fixed row blocks
    + max(h)-1 carry rows, full-window rule COUNT-over-frame == h) must
    be row-identical to the single-partition formulation: same frames,
    same order, same IEEE folds.  chunk_rows=67 forces many chunks and
    carry seams on the fixture; a huge chunk_rows degenerates to the
    old one-partition-per-symbol shape."""
    from real_time_financial_lakehouse_spark.operators.finance import (
        _rolling_vol_stack,
    )

    ev = load_table(spark, sf_dir, "events")

    def key(df):
        return sorted(
            (r["symbol"], r["horizon"], round(r["rv"], 12))
            for r in df.collect()
        )

    chunked = key(_rolling_vol_stack(ev, (5, 20, 60), chunk_rows=67))
    single = key(_rolling_vol_stack(ev, (5, 20, 60), chunk_rows=10**9))
    assert chunked == single
    assert len(chunked) > 0


def test_chunked_trailing_helper_is_exact(spark):
    """_chunked_trailing with aggressive seams (chunk_rows=7) must give
    every non-carry row the identical trailing frame as the plain
    per-key window: same rows, same order, for avg/stddev/collect."""
    from real_time_financial_lakehouse_spark.operators.finance import (
        _chunked_trailing,
    )
    from pyspark.sql import Window

    rows = [("K%d" % (i % 3), i, float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    h = 5

    def plain():
        w = Window.partitionBy("k").orderBy("i").rowsBetween(-(h - 1), 0)
        return sorted(
            (r.k, r.i, round(r.m, 9), r.lst)
            for r in df.select(
                "k", "i",
                F.when(F.count("v").over(w) == h, F.avg("v").over(w)).alias("m"),
                F.collect_list("v").over(w).alias("lst"),
            ).collect()
            if r.m is not None
        )

    def chunked():
        out, wc = _chunked_trailing(df, ["k"], ["i"], h, chunk_rows=7)
        w = wc.rowsBetween(-(h - 1), 0)
        return sorted(
            (r.k, r.i, round(r.m, 9), r.lst)
            for r in out.select(
                "k", "i", "__carry",
                F.when(F.count("v").over(w) == h, F.avg("v").over(w)).alias("m"),
                F.collect_list("v").over(w).alias("lst"),
            ).filter(~F.col("__carry")).collect()
            if r.m is not None
        )

    p, c = plain(), chunked()
    assert p == c
    assert len(p) == 3 * (67 - h + 1) - 1  # 200 rows over 3 keys
