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
