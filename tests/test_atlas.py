"""Generated Graph Atlas vs published, engine-independent constants.

The atlas module never sees book data, so every assertion here is
against an external closed form: OEIS A000088 (graphs per vertex
count), OEIS A008406 (graphs per (n, m)), the orbit-stabilizer
labeled-count identity sum(n!/|Aut|) == 2^C(n,2), and complement
symmetry of the (n, m) histogram.  Index anchors are asserted only
where the documented sort key (atlas.c:34-42) determines them.
"""

from collections import Counter
from math import comb, factorial

import pytest

from igraph_spark.algorithms.atlas import (GRAPH_COUNTS, _atlas_rows_cached,
                                           _canon_local, atlas_table,
                                           graph_atlas)

# OEIS A008406: number of simple graphs on n nodes with m edges, n<=7
A008406 = {
    1: [1],
    2: [1, 1],
    3: [1, 1, 1, 1],
    4: [1, 1, 2, 3, 2, 1, 1],
    5: [1, 1, 2, 4, 6, 6, 6, 4, 2, 1, 1],
    6: [1, 1, 2, 5, 9, 15, 21, 24, 24, 21, 15, 9, 5, 2, 1, 1],
    7: [1, 1, 2, 5, 10, 21, 41, 65, 97, 131, 148, 148,
        131, 97, 65, 41, 21, 10, 5, 2, 1, 1],
}


@pytest.fixture(scope="module")
def rows(spark):
    return _atlas_rows_cached(7)


def test_total_and_per_n_counts(rows):
    assert len(rows) == 1253
    per_n = Counter(r[1] for r in rows)
    for n, expect in enumerate(GRAPH_COUNTS):
        assert per_n[n] == expect, f"n={n}"


def test_per_edge_count_histogram_matches_a008406(rows):
    hist = Counter((r[1], r[2]) for r in rows)
    for n, row in A008406.items():
        got = [hist[(n, m)] for m in range(comb(n, 2) + 1)]
        assert got == row, f"n={n}: {got}"


def test_labeled_count_identity(rows):
    """Orbit-stabilizer: summing n!/|Aut(G)| over the non-isomorphic
    graphs counts every labeled graph exactly once — ties every
    generated automorphism count to 2^C(n,2)."""
    for n in range(8):
        s = sum(factorial(n) // r[4] for r in rows if r[1] == n)
        assert s == 2 ** comb(n, 2), f"n={n}"


def test_complement_symmetry(rows):
    """G <-> complement(G) is an (n, m) -> (n, C(n,2)-m) bijection of
    isomorphism classes."""
    hist = Counter((r[1], r[2]) for r in rows)
    for n in range(8):
        top = comb(n, 2)
        for m in range(top + 1):
            assert hist[(n, m)] == hist[(n, top - m)], f"n={n} m={m}"


def test_key_determined_anchors(rows):
    """Indices the documented key fixes outright: the null graph, K1,
    every block boundary (cumulative A000088), every block's empty and
    complete graph, and all of n <= 3 (every (m, degseq) is unique
    there)."""
    start = 0
    for n, cnt in enumerate(GRAPH_COUNTS):
        first, last = rows[start], rows[start + cnt - 1]
        assert (first[1], first[2]) == (n, 0)            # empty graph
        assert (last[1], last[2]) == (n, comb(n, 2))     # complete graph
        assert last[4] == factorial(n)                   # |Aut(K_n)| = n!
        start += cnt
    assert rows[1252][1:3] == (7, 21)                    # atlas(1252) = K7
    # n=3 block, ids 4..7: empty, one edge, path, triangle
    assert [r[2] for r in rows[4:8]] == [0, 1, 2, 3]
    assert rows[7][3] == "222" and rows[7][4] == 6


def test_reference_fixture_graph_is_present(rows):
    """The reference example (igraph_atlas.out) prints a 5-vertex
    6-edge graph with edges {04,12,13,14,23,24}; the book places it at
    index 45 (inside the documented key's m=7 range — one of the
    book's own ordering deviations, see the module docstring).  The
    GRAPH must exist in our n=5/m=6 span regardless."""
    canon, n_aut = _canon_local(
        5, ((0, 4), (1, 2), (1, 3), (1, 4), (2, 3), (2, 4)))
    span = [r for r in rows if r[1] == 5 and r[2] == 6]
    assert len(span) == 6
    assert any(r[5] == canon for r in span)


def test_graph_atlas_api(spark, rows):
    g = graph_atlas(spark, 1252)
    assert g.vcount() == 7 and g.ecount() == 21 and not g.directed
    g0 = graph_atlas(spark, 0)
    assert g0.vcount() == 0 and g0.ecount() == 0
    with pytest.raises(ValueError):
        graph_atlas(spark, -1)
    with pytest.raises(ValueError):
        graph_atlas(spark, 1253)


def test_atlas_table_dataframe(spark):
    df = atlas_table(spark, n_max=4)
    got = {(r["n"], r["m"]): 1 for r in df.collect()}
    assert df.count() == sum(GRAPH_COUNTS[:5]) == 19
    assert df.columns == ["atlas_id", "n", "m", "degseq", "n_aut", "edges"]
    assert (4, 6) in got


def test_generation_is_deterministic(spark):
    a = _atlas_rows_cached(5)
    _atlas_rows_cached.cache_clear()
    b = _atlas_rows_cached(5)
    assert a[:sum(GRAPH_COUNTS[:6])] == b
