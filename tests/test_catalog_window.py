"""The driver-visible correctness window (first 50 catalog entries).

CORRECTNESS_r05-r09 all sampled the same registration-order window —
five rounds of the newest families going driver-unchecked.  Round 10
makes the window an explicit, curated list (catalog._WINDOW_PRIORITY);
these tests pin its contract so a registry refactor can't silently
rotate it back.
"""

from __future__ import annotations

import json
import os

import pytest

from airflow_crypto_btc_spark.plans.catalog import (
    ALL_QUERIES,
    _WINDOW_PRIORITY,
)

_PREV_WINDOW_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "CORRECTNESS_r10.json",
)


@pytest.mark.smoke
def test_first_50_is_exactly_the_curated_priority_list() -> None:
    assert len(_WINDOW_PRIORITY) == 50
    assert len(set(_WINDOW_PRIORITY)) == 50
    assert list(ALL_QUERIES)[:50] == _WINDOW_PRIORITY


@pytest.mark.smoke
def test_every_windowed_entry_is_oracle_backed() -> None:
    for name in _WINDOW_PRIORITY:
        spec = ALL_QUERIES.get(name)
        assert spec is not None, f"{name} fell out of the catalog"
        assert spec.sql is not None, f"{name} is rows-only: wasted slot"


def test_window_rotated_at_least_ten_entries_vs_previous_round() -> None:
    if not os.path.exists(_PREV_WINDOW_FILE):
        pytest.skip("previous-round CORRECTNESS file not present")
    with open(_PREV_WINDOW_FILE) as fh:
        prev = set(json.load(fh))
    fresh = [n for n in _WINDOW_PRIORITY if n not in prev]
    assert len(fresh) >= 10, f"only {len(fresh)} new-to-window entries"


def test_rows_only_entries_stay_last() -> None:
    names = list(ALL_QUERIES)
    seen_rows_only = False
    for n in names:
        if ALL_QUERIES[n].sql is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-backed {n} sorted after a rows-only entry"
            )
