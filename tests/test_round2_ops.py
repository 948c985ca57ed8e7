"""Semantic tests for the round-2 widening operators: entropy/TF-IDF
profiling, incremental dedup, seeded cluster assignment, Donchian
channels -- planted-structure properties the oracle-parity check can't
express."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from real_time_financial_lakehouse_spark.operators import dedup, finance, similarity, text

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], DOC_COLS
    )

def _md5_mod5(doc_id: int) -> int:
    return int(hashlib.md5(f"delta:{doc_id}".encode()).hexdigest()[:15], 16) % 5

def test_word_entropy_uniform_and_degenerate(spark):
    out = {
        r["doc_id"]: r
        for r in text.word_entropy(
            _docs(spark, [(0, "aa aa aa aa"), (1, "aa bb cc dd")])
        ).collect()
    }
    assert out[0]["n_terms"] == 4 and out[0]["n_types"] == 1
    assert out[0]["entropy"] == 0.0
    assert out[0]["type_token_ratio"] == 0.25
    assert out[1]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert out[1]["type_token_ratio"] == 1.0

def test_tf_idf_top_term_is_the_discriminative_one(spark):
    rows = [(0, "apple apple banana"), (1, "banana cherry cherry")]
    out = text.tf_idf_terms(_docs(spark, rows), topn=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    assert top == {0: "apple", 1: "cherry"}

def test_incremental_dedup_suppresses_base_content(spark):
    base_id = next(i for i in range(100) if _md5_mod5(i) != 0)
    delta_ids = [i for i in range(100) if _md5_mod5(i) == 0][:3]
    dup, fresh, fresh2 = delta_ids
    rows = [
        (base_id, "seen before"),
        (dup, "seen before"),          # delta copy of base content -> dropped
        (fresh, "genuinely new"),      # survives
        (fresh2, "genuinely new"),     # within-delta dup -> min id survives
    ]
    out = dedup.incremental_dedup(_docs(spark, rows), delta_mod=5).collect()
    assert [r["doc_id"] for r in out] == [min(fresh, fresh2)]

def test_incremental_dedup_all_delta_degenerates_to_exact(spark):
    # delta_mod=1: every doc is delta, base empty -> one survivor per content
    rows = [(0, "x y"), (1, "x y"), (2, "z")]
    out = dedup.incremental_dedup(_docs(spark, rows), delta_mod=1).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 2]

def test_cluster_assign_exact_seed_match(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0], "a"),
        (1, [0.0, 1.0, 0.0], "a"),
        (2, [0.0, 0.0, 1.0], "a"),
        (10, [0.9, 0.1, 0.0], "a"),   # nearest seed 0
        (11, [0.0, 1.0, 0.0], "a"),   # exact copy of seed 1
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding", "label"])
    out = {r["vec_id"]: r for r in similarity.cluster_assign(df, n_clusters=3).collect()}
    assert all(out[i]["cluster_id"] == i and out[i]["dist"] == 0.0 for i in range(3))
    assert out[10]["cluster_id"] == 0
    assert out[11]["cluster_id"] == 1 and out[11]["dist"] == 0.0

def test_donchian_null_prefix_and_band_values(spark):
    base = dt.datetime(2024, 1, 1)
    evs = [
        (i, base + dt.timedelta(minutes=i), 1, "s", v, "{}")
        for i, v in enumerate([10.0, 20.0, 30.0])
    ]
    df = spark.createDataFrame(
        evs, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = finance.donchian_channels(df, n=2).orderBy("minute_window").collect()
    assert out[0]["upper_band"] is None and out[0]["channel_pos"] is None
    assert (out[1]["upper_band"], out[1]["lower_band"], out[1]["mid_band"]) == (
        20.0, 10.0, 15.0,
    )
    assert out[1]["channel_pos"] == 1.0  # close == rolling high
    assert out[2]["upper_band"] == 30.0 and out[2]["lower_band"] == 20.0
