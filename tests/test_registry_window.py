"""Driver-window invariants (ADVICE r2 #1).

The grading driver hash-checks only the FIRST 50 entries of ``queries()``.
These tests make the rotation policy mechanical instead of conventional:

1. the explicit ``_PRIORITY`` tuple IS the first-50 window, exactly;
2. every registered query that has never earned a green driver row (per the
   committed CORRECTNESS_r*.json scoreboard files) must sit inside the
   window — a query added this round can therefore never silently land at
   position 51+ the way agg_mode/text_vocab_topk did in round 2.
"""

from __future__ import annotations

import glob
import json
import os

from broadway_kinesis_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _ever_green() -> set[str]:
    ok: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                ok.add(name)
    return ok


def test_priority_is_exactly_the_window():
    assert len(registry._PRIORITY) == WINDOW
    assert len(set(registry._PRIORITY)) == WINDOW, "duplicate names in _PRIORITY"
    first = list(registry.queries())[:WINDOW]
    assert first == list(registry._PRIORITY)


def test_every_never_verified_query_is_inside_the_window():
    registered = set(registry.queries())
    green = _ever_green()
    never_checked = registered - green
    outside = never_checked - set(registry._PRIORITY)
    assert not outside, (
        f"queries with no green driver row ever are outside the first-{WINDOW} "
        f"window and would never be hash-checked: {sorted(outside)}"
    )


def test_priority_names_all_registered():
    registered = set(registry.queries())
    missing = [n for n in registry._PRIORITY if n not in registered]
    assert not missing
