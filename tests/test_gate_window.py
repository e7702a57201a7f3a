"""Machine-checkable gate-window rotation ledger (GATE_WINDOW.json).

The driver's official correctness gate evaluates the first 50 entries
of __spark_entry__.queries().  GATE_WINDOW.json records which cohort
was gated in which round (r01-r05 copied verbatim from the committed
CORRECTNESS artifacts, the latest round = the planned window); these
tests pin the ledger to the code so the rotation policy is verifiable
without reading prose.
"""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NORTH = ["pagerank", "ppr", "wcc_sizes", "scc_sizes",
         "lpa_community_sizes", "triangle_count", "triangles_per_vertex",
         "transitivity"]

CURRENT = "r06"
PREVIOUS = "r05"


@pytest.fixture(scope="module")
def ledger():
    with open(os.path.join(ROOT, "GATE_WINDOW.json")) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def registered():
    import sys
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry
    return list(entry.queries().keys())


def test_window_matches_registration_order(ledger, registered):
    window = ledger["rounds"][CURRENT]
    assert len(window) == ledger["window_size"] == 50
    assert registered[:50] == window, (
        f"the first 50 queries() entries must be exactly the {CURRENT} "
        "window recorded in GATE_WINDOW.json")


def test_north_rule_always_gated(ledger):
    # the always-gated policy was established by the round-3 verdict;
    # r01/r02 predate it (their windows were coverage-ordered)
    for rnd in ("r03", "r04", "r05", "r06"):
        cohort = ledger["rounds"][rnd]
        for q in NORTH:
            assert q in cohort, f"{q} missing from the {rnd} gate"


def test_two_round_rotation_policy(ledger, registered):
    """Every registered query must be gated in the current or previous
    round (officially gated at least once every two rounds) — except
    queries ledgered pending_next_round (registered after the current
    window was sealed at capacity, owed a slot in the NEXT round)."""
    recent = (set(ledger["rounds"][PREVIOUS]) | set(ledger["rounds"][CURRENT])
              | set(ledger.get("pending_next_round", [])))
    missing = [q for q in registered if q not in recent]
    assert not missing, (
        f"queries not gated in {PREVIOUS} or {CURRENT}: {missing}")


def test_owed_tail_gated_in_r06(ledger, registered):
    """Round 6 owed exactly: the 6 displaced_terminal queries (last
    official gate r03) and every query whose last gate was r04.  All
    must be inside the r06 window."""
    window = set(ledger["rounds"]["r06"])
    last = {}
    for rnd in ("r01", "r02", "r03", "r04", "r05"):
        for q in ledger["rounds"].get(rnd, []):
            last[q] = rnd
    pending = set(ledger.get("pending_next_round", []))
    owed = [q for q in registered
            if last.get(q, "r00") <= "r04" and q not in pending]
    missing = [q for q in owed if q not in window]
    assert not missing, f"owed queries outside the r06 window: {missing}"
    # the window is exactly north + owed (capacity check)
    assert set(owed) | set(NORTH) == window


def test_displaced_terminal_is_principled(ledger, registered):
    """displaced_terminal (an r05 artifact) is not a loophole: every
    displaced query must be registered, have a PRIOR official gate
    (r03), not be new or changed in r05, its freed r05 slot must have
    gone to a never-before-gated query — and, now that r06 exists, the
    displaced query must have received its owed official gate there."""
    disp = ledger.get("displaced_terminal", {}).get("queries", [])
    window5 = set(ledger["rounds"]["r05"])
    window6 = set(ledger["rounds"]["r06"])
    previously_gated = set()
    for rnd in ("r01", "r02", "r03", "r04"):
        previously_gated |= set(ledger["rounds"].get(rnd, []))
    for q in disp:
        assert q in registered, f"displaced query {q} is not registered"
        assert q in set(ledger["rounds"]["r03"]), (
            f"displaced query {q} has no prior official r03 gate")
        assert q not in window5, f"displaced query {q} was in the r05 window"
        assert q in window6, f"displaced query {q} not re-gated in r06"
        assert q not in ledger["changed_in"].get("r05", []), (
            f"changed query {q} may not be displaced")
    # the never-gated r05 newcomers must all have made it into r05's
    # window (queries registered in r06 are covered by the pending
    # ledger, not this invariant)
    pending = set(ledger.get("pending_next_round", []))
    never_gated = [q for q in registered
                   if q not in previously_gated and q not in pending]
    missing = [q for q in never_gated if q not in window5]
    assert not missing, (
        f"never-officially-gated queries outside the r05 window: {missing}")


def test_pending_entries_are_new_registered_and_unwindowed(ledger,
                                                           registered):
    """pending_next_round may only hold queries that exist, have never
    been gated, and are NOT in the current window — it is a deferral
    ledger, not a loophole."""
    for q in ledger.get("pending_next_round", []):
        assert q in registered, f"pending query {q} is not registered"
        for rnd, cohort in ledger["rounds"].items():
            assert q not in cohort, (
                f"pending query {q} already gated in {rnd}")


def test_changed_queries_enter_window(ledger):
    for rnd, changed in ledger["changed_in"].items():
        window = set(ledger["rounds"][rnd])
        for q in changed:
            assert q in window, (
                f"changed query {q} must gate the round it ships ({rnd})")


def test_historic_cohorts_match_artifacts(ledger):
    for rnd in ("r02", "r03", "r04", "r05"):
        with open(os.path.join(ROOT, f"CORRECTNESS_{rnd}.json")) as fh:
            assert ledger["rounds"][rnd] == list(json.load(fh).keys())
