"""The bench stdout contract: one JSON line, parseable by a driver that
keeps only the LAST 2000 characters of stdout.

Round 12's line was ~2.1 kB and the driver recorded "parsed": null with
a tail that starts mid-line (BENCH_r12.json) -- so the contract is now
enforced here against a simulated 10,000-query registry: the payload
must be registry-size-INDEPENDENT and shrink_to_fit() must keep the
serialized line under STDOUT_LINE_CAP (1600 < 2000 with margin for a
stray trailing newline) no matter what.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_run(n_queries: int):
    """Simulate a bench run's aggregates for an n_queries registry with
    adversarially long names (worst case for any per-query map)."""
    timings = {
        f"extremely_long_query_name_padding_the_map_{i:06d}": round(
            0.1 + (i % 97) * 0.013, 3
        )
        for i in range(n_queries)
    }
    # include the flagship names so that subset is non-empty (real runs
    # always have them)
    for n in ("gold_market_summary", "minute_ohlc", "pricing_summary",
              "dedup_exact", "lsh_candidate_pairs", "cosine_topk",
              "bm25_search", "streaming_silver_roundtrip"):
        timings[n] = 0.5
    fam_totals = {f: round(sum(timings.values()) / 6, 3)
                  for f in ("batch", "streaming", "table_io", "dedup",
                            "ann", "text")}
    breakdown = {
        "identity": "machinery_total = streaming.total + table_io.total",
        "warmup_sec": 12.3,
    }
    for fam in ("streaming", "table_io"):
        members = dict(list(timings.items())[:40])
        breakdown[fam] = {
            "n_queries": len(members),
            "total": round(sum(members.values()), 3),
            "mean_per_query": 1.234,
            "top5": dict(sorted(members.items(), key=lambda kv: -kv[1])[:5]),
        }
    canary = {"ratio": 1.0123}
    segments = {"n": n_queries // 25 + 1, "median": 1.01, "min": 0.97,
                "max": 1.43}
    return bench.build_stdout_payload(
        total=round(sum(timings.values()), 3),
        reps=3,
        timings=timings,
        fam_totals=fam_totals,
        machinery=123.456,
        machinery_breakdown=breakdown,
        warmup_sec=12.3,
        canary=canary,
        canary_segments=segments,
        sf=0.1,
    )


def test_line_under_cap_at_10k_queries():
    payload = _fake_run(10_000)
    line = bench.shrink_to_fit(payload)
    assert len(line) <= bench.STDOUT_LINE_CAP, len(line)
    assert bench.STDOUT_LINE_CAP < 2000  # the driver's capture window


def test_line_is_single_parseable_json():
    for n in (50, 369, 1000, 10_000):
        line = bench.shrink_to_fit(_fake_run(n))
        assert "\n" not in line
        parsed = json.loads(line)
        # the never-dropped driver contract
        assert parsed["metric"] == "rtfl_query_inventory_total_wall"
        assert parsed["value"] > 0
        assert parsed["n_queries"] == n + 8 or parsed["n_queries"] == n
        assert parsed["canary_ratio"] == 1.0123
        assert "families" in parsed and "machinery_total" in parsed


def test_shrink_preserves_required_keys_under_tiny_cap():
    payload = _fake_run(369)
    line = bench.shrink_to_fit(payload, cap=500)
    parsed = json.loads(line)
    for k in ("metric", "value", "n_queries", "canary_ratio", "families",
              "machinery_total", "data_total", "sf"):
        assert k in parsed, k
    # optional keys were sacrificed, not the contract
    assert "queries" not in parsed


def test_payload_is_size_independent():
    small = bench.shrink_to_fit(_fake_run(369))
    large = bench.shrink_to_fit(_fake_run(10_000))
    # growing the registry 27x may only change digits, not structure
    assert abs(len(large) - len(small)) < 200
