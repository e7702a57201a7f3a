"""FSM support measures + gspan vs a pure-Python brute-force oracle
(reference: src/fsm.c — shallow/mib/egobased/aggregated support,
igraph_gspan DEFAULT variant)."""

import itertools

import pytest

from igraph_spark.algorithms.fsm import (
    Pattern, db_embeddings, shallow_support, mib_support,
    egobased_support, db_support, gspan)


# ------------------------------------------------------------- fixtures

# graph database: gid -> (edges, vcolors)   (vertex ids are per-graph)
DB = {
    0: ([(0, 1), (1, 2), (2, 0), (2, 3)], [0, 0, 1, 0]),   # triangle+tail
    1: ([(0, 1), (1, 2), (2, 3), (3, 0)], [0, 1, 0, 1]),   # 4-cycle
    2: ([(0, 1), (1, 2), (2, 0)], [1, 1, 1]),              # triangle
    3: ([(0, 1), (0, 2), (0, 3), (0, 4)], [0, 1, 1, 1, 1]),  # star K1,4
}


def _db_dfs(spark, with_colors=False):
    erows, vrows = [], []
    for gid, (edges, vcols) in DB.items():
        for s, d in edges:
            erows.append((gid, s, d))
        for i, c in enumerate(vcols):
            vrows.append((gid, i, c))
    e = spark.createDataFrame(erows, "gid long, src long, dst long")
    v = spark.createDataFrame(
        vrows, "gid long, id long, vcolor long") if with_colors else None
    return e, v


# ------------------------------------------------- brute-force oracle

def _brute_embeddings(gedges, gvcols, pat: Pattern):
    """All injective maps pattern->graph, itertools over vertex tuples."""
    verts = sorted({v for e in gedges for v in e})
    eset = set(gedges) | {(b, a) for a, b in gedges}
    out = []
    for imgs in itertools.permutations(verts, pat.k):
        ok = True
        for (a, b) in pat.edges:
            pair = (imgs[a], imgs[b])
            if pat.directed:
                if pair not in set(gedges):
                    ok = False
                    break
            elif pair not in eset:
                ok = False
                break
        if ok and pat.vcolors is not None:
            for i, c in enumerate(pat.vcolors):
                if gvcols[imgs[i]] != c:
                    ok = False
                    break
        if ok:
            out.append(imgs)
    return out


def _brute_support(pat, measure, colored):
    per = {}
    for gid, (edges, vcols) in DB.items():
        embs = _brute_embeddings(edges, vcols if colored else None, pat)
        if not embs:
            continue
        if measure == "shallow":
            per[gid] = 1
        elif measure == "mib":
            per[gid] = min(len({e[i] for e in embs}) for i in range(pat.k))
        elif measure == "ego":
            per[gid] = len({e[0] for e in embs})
    return per


# ---------------------------------------------------------------- tests

WEDGE = Pattern(edges=((0, 1), (1, 2)))
TRIANGLE = Pattern(edges=((0, 1), (1, 2), (2, 0)))
COLORED_EDGE = Pattern(edges=((0, 1),), vcolors=(0, 1))


@pytest.mark.parametrize("pat", [WEDGE, TRIANGLE])
@pytest.mark.parametrize("measure", ["shallow", "mib", "ego"])
def test_support_measures_match_brute_force(spark, pat, measure):
    e, _ = _db_dfs(spark)
    fn = {"shallow": shallow_support, "mib": mib_support,
          "ego": egobased_support}[measure]
    got = {int(r["gid"]): int(r["support"])
           for r in fn(e, pat).collect() if r["support"] > 0}
    assert got == _brute_support(pat, measure, colored=False)


def test_vertex_colored_support(spark):
    e, v = _db_dfs(spark, with_colors=True)
    got = {int(r["gid"]): int(r["support"])
           for r in mib_support(e, COLORED_EDGE, vertices=v).collect()
           if r["support"] > 0}
    assert got == _brute_support(COLORED_EDGE, "mib", colored=True)


def test_db_support_aggregates(spark):
    e, _ = _db_dfs(spark)
    want = sum(_brute_support(TRIANGLE, "shallow", False).values())
    assert db_support(e, TRIANGLE, "shallow") == want == 2


def test_embeddings_count_triangle(spark):
    e, _ = _db_dfs(spark)
    emb = db_embeddings(e, TRIANGLE)
    # 6 automorphic images per triangle occurrence, graphs 0 and 2
    per = {int(r["gid"]): int(r["n"]) for r in
           emb.groupBy("gid").count().withColumnRenamed(
               "count", "n").collect()}
    assert per == {0: 6, 2: 6}


def test_induced_wedge_excludes_triangle(spark):
    e, _ = _db_dfs(spark)
    emb = db_embeddings(e, WEDGE, induced=True)
    gids = {int(r["gid"]) for r in emb.select("gid").distinct().collect()}
    # graph 2 (pure triangle) has no INDUCED wedge
    assert 2 not in gids and {0, 1, 3} <= gids


def test_gspan_uncolored_matches_brute_force(spark):
    e, _ = _db_dfs(spark)
    found = gspan(e, min_supp=3, max_edges=2, measure="shallow")
    # wedge (in 4 graphs) and single edge (in 4) are the only patterns
    # with shallow DB support >= 3 at <= 2 edges
    got = {(len(fp.pattern.edges), fp.support) for fp in found}
    assert got == {(1, 4), (2, 4)}


def test_gspan_colored(spark):
    e, v = _db_dfs(spark, with_colors=True)
    found = gspan(e, min_supp=3, max_edges=1, measure="shallow",
                  vertices=v)
    # colored single edges: (0,1) appears in graphs 0(v2 c1),1,3 -> 3
    sup = {fp.pattern.vcolors: fp.support for fp in found}
    assert sup == {(0, 1): 3}


def test_gspan_anti_monotone_and_dedup(spark):
    e, _ = _db_dfs(spark)
    found = gspan(e, min_supp=2, max_edges=3, measure="shallow")
    keys = [fp.pattern.canonical_key() for fp in found]
    assert len(keys) == len(set(keys))          # no duplicate patterns
    by_edges = {}
    for fp in found:
        by_edges.setdefault(len(fp.pattern.edges), []).append(fp.support)
    # triangle support 2, present at level 3
    assert any(s == 2 for s in by_edges.get(3, []))
