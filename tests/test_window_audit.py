"""Regression tests for the gate-window audit's sit-out-plan semantics.

Round-8 VERDICT "what's wrong #1": four straight rounds of window_audit
exiting 2 for *planned* staleness trained everyone to ignore nonzero
exits.  The fix (round 9) makes the plan machine-readable
(queries/__init__.py:PLANNED_SITOUTS) and the audit exit 0 iff observed
staleness matches the plan exactly.  These tests pin that contract:
an UNPLANNED stale query must exit 2 regardless of what else is green.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "window_audit",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "window_audit.py"),
)
window_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(window_audit)

GREEN = {"rows_match": True, "schema_match": True}
RED = {"rows_match": False, "schema_match": True}
ROWS_ONLY = {"err": "no_oracle", "spark_rows": 7}


def _rounds(latest, *older):
    """Build [(round_no, rows)…] with `latest` at r8 and each older
    dict one round earlier."""
    out = [(8, latest)]
    for i, rows in enumerate(older):
        out.append((7 - i, rows))
    return out


def test_healthy_window_exits_zero():
    names = ["a", "b", "c"]
    rounds = _rounds({"a": GREEN, "b": GREEN}, {"c": GREEN})
    rep = window_audit.classify(names, rounds, (), window=2)
    assert rep["exit"] == 0
    assert rep["stale"] == [] and rep["planned"] == []


def test_unplanned_stale_query_exits_two():
    # "d" last green at r6 (2 rounds stale), outside the window, and
    # NOT in the plan → rotation bug, exit 2.
    names = ["a", "b", "d"]
    rounds = _rounds({"a": GREEN, "b": GREEN}, {}, {"d": GREEN})
    rep = window_audit.classify(names, rounds, (), window=2)
    assert rep["exit"] == 2
    assert rep["stale"] == ["d"]


def test_planned_stale_green_exits_zero():
    # Same staleness, but "d" is in the plan and green → expected.
    names = ["a", "b", "d"]
    rounds = _rounds({"a": GREEN, "b": GREEN}, {}, {"d": GREEN})
    rep = window_audit.classify(names, rounds, ("d",), window=2)
    assert rep["exit"] == 0
    assert rep["planned"] == ["d"] and rep["stale"] == []


def test_planned_but_red_still_exits_two():
    # A stale AND red row is a real regression no plan excuses.
    names = ["a", "b", "d"]
    rounds = _rounds({"a": GREEN, "b": GREEN}, {}, {"d": RED})
    rep = window_audit.classify(names, rounds, ("d",), window=2)
    assert rep["exit"] == 2
    assert "d" in rep["stale"] and "d" in rep["red"]


def test_hard_ceiling_fails_even_when_planned():
    # Round-11 hard ceiling (VERDICT r10 item 3): >2 rounds stale is a
    # failure NO plan excuses — "d" last green r5 with latest r8 (age
    # 3), in the plan and green, must still exit 2.
    names = ["a", "b", "d"]
    rounds = _rounds({"a": GREEN, "b": GREEN}, {}, {}, {"d": GREEN})
    rep = window_audit.classify(names, rounds, ("d",), window=2)
    assert rep["exit"] == 2
    assert rep["stale"] == ["d"] and rep["planned"] == []


def test_hard_ceiling_applies_inside_window_too():
    # An age-3 row sitting INSIDE the window (about to be re-checked)
    # still means the rotation let it slip past the ceiling twice —
    # flag it rather than silently absorb the drift.
    names = ["d", "a", "b"]
    rounds = _rounds({"a": GREEN, "b": GREEN}, {}, {}, {"d": GREEN})
    rep = window_audit.classify(names, rounds, (), window=2)
    assert rep["exit"] == 2
    assert rep["stale"] == ["d"]


def test_planned_sitout_inside_window_is_a_plan_bug():
    names = ["a", "b", "c"]
    rounds = _rounds({"a": GREEN, "b": GREEN, "c": GREEN})
    rep = window_audit.classify(names, rounds, ("a",), window=2)
    assert rep["exit"] == 2
    assert rep["plan_bugs"] == ["a"]


def test_planned_sitout_unregistered_is_a_plan_bug():
    names = ["a", "b"]
    rounds = _rounds({"a": GREEN, "b": GREEN})
    rep = window_audit.classify(names, rounds, ("ghost",), window=2)
    assert rep["exit"] == 2
    assert rep["plan_bugs"] == ["ghost"]


def test_never_checked_outside_window_exits_two():
    names = ["a", "b", "n"]
    rounds = _rounds({"a": GREEN, "b": GREEN})
    rep = window_audit.classify(names, rounds, (), window=2)
    assert rep["exit"] == 2
    assert rep["never"] == ["n"]


def test_rows_only_needs_nonzero_rows():
    ok = dict(ROWS_ONLY)
    empty = {"err": "no_oracle", "spark_rows": 0}
    assert window_audit.row_ok(ok)
    assert not window_audit.row_ok(empty)


def test_live_repo_plan_matches_observed_staleness():
    """The real repo state must satisfy its own plan (this is the
    round-end gate the driver's judge re-runs)."""
    assert window_audit.main() == 0
