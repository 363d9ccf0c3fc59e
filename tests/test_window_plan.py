"""Pin the committed _PRIORITY window to tools/window_plan.py output.

VERDICT r12 item 3: the hand-maintained window comment drifted (said "4
leftover r7 rows" when the recount said 11). The window is now generated
mechanically; this test fails if _PRIORITY is hand-edited out of sync
with the evidence it was planned from, or if a newly registered query is
not re-planned into the window front.

PLANNED_THROUGH pins the evidence horizon the committed window was
generated from, so the test stays green after the driver lands newer
CORRECTNESS files. When rotating for round N+1, regenerate _PRIORITY
with ``python tools/window_plan.py --through N`` and bump the constant.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

PLANNED_THROUGH = 16
WINDOW = 50


def test_priority_matches_mechanical_plan():
    import window_plan
    from pyresample_spark import queries

    chosen, deferred, evid, never = window_plan.plan(WINDOW, PLANNED_THROUGH)
    assert list(queries._PRIORITY) == chosen, (
        "committed _PRIORITY drifted from tools/window_plan.py "
        f"--through {PLANNED_THROUGH}; regenerate it "
        f"(in priority but not plan: {[q for q in queries._PRIORITY if q not in chosen]}, "
        f"in plan but not priority: {[q for q in chosen if q not in queries._PRIORITY]})"
    )


def test_never_checked_queries_lead_the_window():
    import window_plan
    from pyresample_spark import queries

    chosen, _deferred, evid, never = window_plan.plan(WINDOW, PLANNED_THROUGH)
    # Every never-checked (newly registered) query must be in the window
    # and ahead of every already-evidenced row.
    for q in never:
        assert q in chosen[: len(never)], f"new query {q} not at window front"


def test_window_size_is_driver_window():
    from pyresample_spark import queries

    assert len(queries._PRIORITY) == WINDOW
    assert len(set(queries._PRIORITY)) == WINDOW
