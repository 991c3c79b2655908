"""The bench chunk emitter: every per-query median must survive the
driver's fixed-size tail capture (BENCH_r07 parsed null, BENCH_r08 lost
28/93 medians — both from one monolithic per-query line losing its head).

The contract tested here: chunk lines are bounded (<~1.3 KB serialized),
self-identifying (chunk i of n), and their union reconstructs the full
medians map byte-for-byte, in catalog order.
"""

from __future__ import annotations

import json

import pytest

import bench


def _fake_timings() -> dict[str, float]:
    # Realistic shape: the actual headline names with plausible medians.
    return {name: round(0.1 + (i % 17) * 0.37, 4) for i, name in enumerate(bench.HEADLINE)}


@pytest.mark.smoke
def test_chunks_reconstruct_full_map_in_order() -> None:
    timings = _fake_timings()
    chunks = bench.chunk_timings(timings)
    merged: dict[str, float] = {}
    for c in chunks:
        merged.update(c)
    assert merged == timings
    assert list(merged) == list(timings)  # catalog order preserved


@pytest.mark.smoke
def test_emitted_chunk_lines_are_bounded() -> None:
    timings = _fake_timings()
    chunks = bench.chunk_timings(timings)
    assert len(chunks) >= 2  # 90+ queries never fit one bounded chunk
    for i, chunk in enumerate(chunks, start=1):
        line = json.dumps(
            {
                "metric": "headline_queries_chunk",
                "chunk": i,
                "of": len(chunks),
                "sf": 0.1,
                "reps": 3,
                "stat": "median_per_query",
                "queries": chunk,
            },
            separators=(",", ":"),
        )
        assert len(line) <= 1400, f"chunk {i} serialized to {len(line)} bytes"


@pytest.mark.smoke
def test_total_emitted_bytes_fit_a_small_tail_window() -> None:
    # All chunk lines + the summary line together must stay well under a
    # conservative guess at the driver's capture window so nothing is cut.
    timings = _fake_timings()
    chunks = bench.chunk_timings(timings)
    total_bytes = sum(
        len(
            json.dumps(
                {
                    "metric": "headline_queries_chunk",
                    "chunk": i,
                    "of": len(chunks),
                    "sf": 0.1,
                    "reps": 3,
                    "stat": "median_per_query",
                    "queries": c,
                },
                separators=(",", ":"),
            )
        )
        + 1
        for i, c in enumerate(chunks, start=1)
    )
    total_bytes += len(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "sf": 0.1,
                "n_queries": len(timings),
            },
            separators=(",", ":"),
        )
    )
    assert total_bytes < 6000, f"bench emits {total_bytes} bytes; tail capture risk"


def test_chunking_handles_tiny_and_empty_maps() -> None:
    assert bench.chunk_timings({}) == []
    one = {"flagship_daily_indicators": 1.2345}
    assert bench.chunk_timings(one) == [one]
