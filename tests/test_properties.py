"""Property-based invariants (SURVEY section 5.5): relationships that must
hold for ANY input, which the fixed-fixture oracle tests can't establish.
Kept to few examples per property -- each example spins Spark jobs."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_financial_lakehouse_spark.operators.rollup import events_market_summary
from real_time_financial_lakehouse_spark.operators.silver import sliding_window_agg
from real_time_financial_lakehouse_spark.operators.windows import ema_per_symbol

BASE_TS = dt.datetime(2024, 1, 1)

event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),          # ts offset seconds
        st.sampled_from(["click", "view", "purchase"]),       # event_type
        st.floats(min_value=0.01, max_value=1000.0, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
)

_few = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

def _events_df(spark, rows):
    data = [
        (i, BASE_TS + dt.timedelta(seconds=off), i % 7, etype, float(val), "{}")
        for i, (off, etype, val) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )

@_few
@given(rows=event_rows)
def test_gold_rollup_invariants(spark, rows):
    df = _events_df(spark, rows)
    out = events_market_summary(df).collect()
    # every input row lands in exactly one (symbol, minute) group
    assert sum(r["transaction_count"] for r in out) == len(rows)
    for r in out:
        assert r["min_price"] <= r["avg_price"] <= r["max_price"]
        assert r["volatility"] >= 0.0

@_few
@given(rows=event_rows)
def test_sliding_window_double_counts(spark, rows):
    df = _events_df(spark, rows)
    out = sliding_window_agg(df).collect()
    # 60s window / 30s slide: every event belongs to exactly 2 windows
    assert sum(r["n_events"] for r in out) == 2 * len(rows)
    for r in out:
        assert r["volatility"] >= 0.0

@_few
@given(rows=event_rows)
def test_ema_is_convex_combination(spark, rows):
    df = _events_df(spark, rows)
    out = ema_per_symbol(df).collect()
    assert sum(r["n_events"] for r in out) == len(rows)
    by_symbol = df.groupBy("event_type").agg(F.min("value"), F.max("value")).collect()
    bounds = {r[0]: (r[1], r[2]) for r in by_symbol}
    eps = 1e-6  # qround quantum
    for r in out:
        lo, hi = bounds[r["symbol"]]
        assert lo - eps <= r["ema"] <= hi + eps

@_few
@given(rows=event_rows, threshold=st.floats(min_value=0.01, max_value=999.0))
def test_union_partition_is_lossless(spark, rows, threshold):
    df = _events_df(spark, rows)
    high = df.filter(F.col("value") >= threshold)
    low = df.filter(F.col("value") < threshold)
    assert high.unionByName(low).count() == len(rows)


# ---------------------------------------------------------------------------
# as-of join: the three plans agree on ANY input
# ---------------------------------------------------------------------------

asof_left = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=600),              # ts offset secs
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),  # key
    ),
    min_size=1,
    max_size=25,
)
asof_right = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=600),
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
    ),
    min_size=0,
    max_size=25,
)


@_few
@given(left=asof_left, right=asof_right)
def test_asof_sorted_equals_naive_on_any_input(spark, left, right):
    """Differential fuzz of the zero-fan-out union-sort as-of plan vs the
    naive ranged-join form: duplicate timestamps (colliding offsets are
    likely by construction), NULL keys, keys with no/empty right side --
    the fixture differential (test_scale_plans) can't produce these."""
    from real_time_financial_lakehouse_spark.operators import joins

    ldf = spark.createDataFrame(
        [
            (i, BASE_TS + dt.timedelta(seconds=off), k)
            for i, (off, k) in enumerate(left)
        ],
        "event_id long, ts timestamp, user_id long",
    )
    rdf = spark.createDataFrame(
        [
            (1000 + j, k, BASE_TS + dt.timedelta(seconds=off), float(v))
            for j, (off, k, v) in enumerate(right)
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    kwargs = dict(
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_tiebreak="o_orderkey",
    )
    cols = ["event_id", "ts", "user_id", "o_orderkey", "o_orderdate", "o_totalprice"]
    fast = joins.asof_join_sorted(ldf, rdf, **kwargs).select(*cols)
    naive = joins.asof_join(ldf, rdf, left_id="event_id", **kwargs).select(*cols)
    f, n = sorted(map(tuple, fast.collect())), sorted(map(tuple, naive.collect()))
    assert f == n


# ---------------------------------------------------------------------------
# dedup_clusters: labels ARE the connected components of the edge graph
# ---------------------------------------------------------------------------

_TEMPLATES = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu",
    "one two three four five six seven eight nine ten eleven twelve",
    "red orange yellow green blue indigo violet cyan magenta black white gray",
]

dedup_docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), st.booleans()),
    min_size=2,
    max_size=12,
)


@_few
@given(docs=dedup_docs)
def test_dedup_cluster_labels_match_union_find(spark, docs):
    """The distributed min-label propagation must produce exactly the
    connected components (label = min reachable doc_id) of whatever edge
    set the LSH ladder emits -- checked against a driver-side union-find
    over the same edges, for corpora full of planted near-duplicates."""
    from real_time_financial_lakehouse_spark.operators import dedup

    rows = []
    for i, (tmpl, mutate) in enumerate(docs):
        text = _TEMPLATES[tmpl] + (f" extra{i}" if mutate else "")
        rows.append((i, text, "en", "s", len(text)))
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(df, k=8, bands=4).collect()
    ]
    parent = {i: i for i in range(len(docs))}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(len(docs))}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(df, k=8, bands=4).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# versioned table: any commit/compact sequence preserves every snapshot
# ---------------------------------------------------------------------------

version_ops = st.lists(
    st.one_of(
        st.tuples(st.just("commit"), st.integers(min_value=0, max_value=30)),
        st.tuples(st.just("compact"), st.just(0)),
    ),
    min_size=1,
    max_size=6,
)


@_few
@given(ops=version_ops)
def test_versioned_table_time_travel_under_any_op_sequence(spark, tmp_path_factory, ops):
    """Snapshot isolation as a property: after ANY interleaving of
    commits and compactions, every version reads back exactly the rows
    that were current when it committed (compaction is a rewrite -- a
    new version with identical content)."""
    from real_time_financial_lakehouse_spark.operators import versioned

    table = str(tmp_path_factory.mktemp("vt") / "t")
    expected = {}  # version -> sorted row ids
    current = []
    for op, arg in ops:
        if op == "commit":
            current = list(range(arg + 1))
            df = spark.createDataFrame([(i,) for i in current], "id long")
            v = versioned.commit_version(df, table)
        else:
            if not expected:
                continue  # nothing to compact yet
            v = versioned.compact(spark, table)
        expected[v] = sorted(current)
    for v, rows in expected.items():
        got = sorted(
            r["id"] for r in versioned.read_version(spark, table, v).collect()
        )
        assert got == rows, f"version {v}"


doc_rows = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40),
    min_size=1,
    max_size=25,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"s{i % 3}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@_few
@given(texts=doc_rows)
def test_cms_never_undercounts_property(spark, texts):
    """Count-min containment must hold for ANY corpus: the sketch
    estimate is >= the exact count for every reported term."""
    from real_time_financial_lakehouse_spark.operators.text import heavy_hitters_cms

    for r in heavy_hitters_cms(_docs_df(spark, texts), topn=100).collect():
        assert r["est_count"] >= r["exact_count"]
        assert r["overcount"] >= 0


@_few
@given(texts=doc_rows)
def test_bloom_dedup_no_false_negatives_property(spark, texts):
    """For ANY corpus: a delta doc whose fingerprint exists in the base
    must be flagged a Bloom candidate AND a confirmed duplicate (bits
    are never lost), and kept == not confirmed."""
    from real_time_financial_lakehouse_spark.operators.dedup import (
        bloom_incremental_dedup,
    )

    rows = bloom_incremental_dedup(_docs_df(spark, texts)).collect()
    for r in rows:
        if r["confirmed_dup"]:
            assert r["bloom_candidate"]
        assert r["kept"] == (not r["confirmed_dup"])


@_few
@given(texts=doc_rows)
def test_boilerplate_strip_conservation_property(spark, texts):
    """For ANY corpus: per doc, kept + removed segments == total
    segments, and a corpus of all-distinct docs is never stripped."""
    from real_time_financial_lakehouse_spark.operators.pipeline import (
        boilerplate_strip,
    )

    rows = boilerplate_strip(_docs_df(spark, texts)).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert 0 <= r["n_removed"] <= r["n_segments"]
        # clean text never longer than the normalized original
        assert len(r["clean_text"]) <= len(" ".join(texts[r["doc_id"]].split())) + 1


@_few
@given(texts=doc_rows)
def test_split_counts_partition_property(spark, texts):
    """The md5 split is a PARTITION for any corpus: split sizes sum to
    the corpus size and shares sum to 1."""
    from real_time_financial_lakehouse_spark.operators.pipeline import (
        dataset_split_counts,
    )

    rows = dataset_split_counts(_docs_df(spark, texts)).collect()
    assert sum(r["n_docs"] for r in rows) == len(texts)
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-4


@_few
@given(rows=event_rows)
def test_skyline_exactly_the_undominated_set(spark, rows):
    """For ANY input, the skyline window sweep must return exactly the
    points no other same-symbol point weakly dominates with one strict
    edge -- checked against a brute-force O(n^2) reference."""
    from real_time_financial_lakehouse_spark.operators.finance import skyline_days

    data = [
        (i, BASE_TS + dt.timedelta(seconds=off), i % 7, etype, float(val),
         '{"k": %d}' % ((i % 5) + 1))
        for i, (off, etype, val) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {(r["symbol"], r["day"]) for r in skyline_days(df).collect()}
    # brute-force reference on the same rounded plane
    import collections

    agg = collections.defaultdict(lambda: [0.0, 0.0, 0])
    for i, (off, etype, val) in enumerate(rows):
        day = (BASE_TS + dt.timedelta(seconds=off)).date()
        a = agg[(etype, day)]
        a[0] += ((i % 5) + 1) * float(val)
        a[1] += float(val)
        a[2] += 1
    import math

    pts = {
        k: (math.floor(v[0] * 1e6 + 0.5) / 1e6,
            math.floor(v[1] / v[2] * 1e6 + 0.5) / 1e6)
        for k, v in agg.items()
    }
    expected = set()
    for (sym, day), (x, y) in pts.items():
        dominated = any(
            s2 == sym and (x2, y2) != (x, y) and x2 >= x and y2 >= y
            for (s2, _), (x2, y2) in pts.items()
        ) and any(
            s2 == sym and x2 >= x and y2 >= y and (x2 > x or y2 > y)
            for (s2, _), (x2, y2) in pts.items()
        )
        if not dominated:
            expected.add((sym, day))
    got_days = {(s, d.date()) for s, d in got}
    assert got_days == expected


@_few
@given(rows=event_rows)
def test_dollar_bars_partition_ticks_and_conserve_dollars(spark, rows):
    """Bars partition the tape: tick counts sum to the input size and
    per-bar dollar volumes sum to the total traded dollars."""
    from real_time_financial_lakehouse_spark.operators.finance import dollar_bars

    data = [
        (i, BASE_TS + dt.timedelta(seconds=off), i % 7, etype, float(val),
         '{"k": %d}' % ((i % 4) + 1))
        for i, (off, etype, val) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = dollar_bars(df, bucket_dollars=500.0).collect()
    assert sum(r["n_ticks"] for r in out) == len(rows)
    total = sum(((i % 4) + 1) * float(val) for i, (_, _, val) in enumerate(rows))
    # dollar_volume is quantized at 6 dp (mirroring the oracle), so the
    # conservation check must allow up to 5e-7 absolute error per bar on
    # top of float accumulation noise.
    assert sum(r["dollar_volume"] for r in out) == pytest.approx(
        total, rel=1e-6, abs=5e-7 * max(1, len(out))
    )
    for r in out:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["bar_start"] <= r["bar_end"]


doc_texts = st.lists(
    st.text(alphabet="abcde ", min_size=0, max_size=40), min_size=1, max_size=25
)


@_few
@given(texts=doc_texts)
def test_kmv_estimate_exact_below_k_property(spark, texts):
    """For ANY corpus with fewer distinct contents than k, the KMV
    estimate must equal the exact distinct count."""
    from real_time_financial_lakehouse_spark.operators.profiling import (
        kmv_distinct_estimate,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = kmv_distinct_estimate(docs, k=64).collect()
    for r in out:
        assert r["n_kept"] == r["exact_distinct"] <= 64
        assert r["kmv_estimate"] == float(r["exact_distinct"])
        assert r["rel_error"] == 0.0


@_few
@given(texts=doc_texts)
def test_weighted_sample_is_subset_and_capped(spark, texts):
    """The weighted sample is always a subset of the positive-weight
    docs, at most n per source, with ranks contiguous from 1."""
    from real_time_financial_lakehouse_spark.operators.pipeline import (
        weighted_sample_per_source,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = weighted_sample_per_source(docs, n=5).collect()
    eligible = {i for i, t in enumerate(texts) if len(t) > 0}
    by_source: dict = {}
    for r in out:
        assert r["doc_id"] in eligible
        by_source.setdefault(r["source"], []).append(r["rank"])
    for ranks in by_source.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
