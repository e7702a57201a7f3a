"""Machine-checkable gate-window rotation ledger (GATE_WINDOW.json).

The driver's official correctness gate evaluates the first 50 entries
of __spark_entry__.queries().  GATE_WINDOW.json records which cohort
was gated in which round (r01-r04 copied verbatim from the committed
CORRECTNESS artifacts, r05 = the planned window); these tests pin the
ledger to the code so the rotation policy is verifiable without
reading prose.
"""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NORTH = ["pagerank", "ppr", "wcc_sizes", "scc_sizes",
         "lpa_community_sizes", "triangle_count", "triangles_per_vertex",
         "transitivity"]


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
    window = ledger["rounds"]["r05"]
    assert len(window) == ledger["window_size"] == 50
    assert registered[:50] == window, (
        "the first 50 queries() entries must be exactly the r05 window "
        "recorded in GATE_WINDOW.json")


def test_north_rule_always_gated(ledger):
    # the always-gated policy was established by the round-3 verdict;
    # r01/r02 predate it (their windows were coverage-ordered)
    for rnd in ("r03", "r04", "r05"):
        cohort = ledger["rounds"][rnd]
        for q in NORTH:
            assert q in cohort, f"{q} missing from the {rnd} gate"


def test_two_round_rotation_policy(ledger, registered):
    """Every registered query must be gated in the current or previous
    round (officially gated at least once every two rounds) — except
    queries ledgered pending_next_round (registered after the current
    window was sealed at capacity, owed a slot in the NEXT round) and,
    in the terminal round only, the displaced_terminal cohort whose
    rotation slot was given to a never-gated new query (see
    test_displaced_terminal_is_principled)."""
    recent = (set(ledger["rounds"]["r04"]) | set(ledger["rounds"]["r05"])
              | set(ledger.get("pending_next_round", []))
              | set(ledger.get("displaced_terminal", {}).get("queries", [])))
    missing = [q for q in registered if q not in recent]
    assert not missing, f"queries not gated in r04 or r05: {missing}"


def test_displaced_terminal_is_principled(ledger, registered):
    """displaced_terminal is not a loophole: every displaced query must
    be registered, have a PRIOR official gate (r03), not be new or
    changed in r05, and its freed slot must be used by a query that has
    never been officially gated (the whole point of the swap)."""
    disp = ledger.get("displaced_terminal", {}).get("queries", [])
    window = set(ledger["rounds"]["r05"])
    previously_gated = set()
    for rnd in ("r01", "r02", "r03", "r04"):
        previously_gated |= set(ledger["rounds"].get(rnd, []))
    for q in disp:
        assert q in registered, f"displaced query {q} is not registered"
        assert q in set(ledger["rounds"]["r03"]), (
            f"displaced query {q} has no prior official r03 gate")
        assert q not in window, f"displaced query {q} still in the window"
        assert q not in ledger["changed_in"].get("r05", []), (
            f"changed query {q} may not be displaced")
    # the never-gated newcomers must all have made it into the window
    never_gated = [q for q in registered if q not in previously_gated]
    missing = [q for q in never_gated if q not in window]
    assert not missing, (
        f"never-officially-gated queries outside the final window: {missing}")


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
    window = set(ledger["rounds"]["r05"])
    for q in ledger["changed_in"]["r05"]:
        assert q in window, f"changed query {q} must gate the round it ships"


def test_historic_cohorts_match_artifacts(ledger):
    for rnd in ("r02", "r03", "r04"):
        with open(os.path.join(ROOT, f"CORRECTNESS_{rnd}.json")) as fh:
            assert ledger["rounds"][rnd] == list(json.load(fh).keys())
