"""get_all_simple_paths vs a pure-Python DFS oracle
(reference: src/paths.c:60 igraph_get_all_simple_paths)."""

from igraph_spark import Graph, get_all_simple_paths


def _brute(edges, directed, source, targets, cutoff):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    out = []

    def dfs(path):
        term = path[-1]
        if len(path) > 1 and (targets is None or term in targets):
            out.append(tuple(path))
        if cutoff is not None and len(path) - 1 >= cutoff:
            return
        for nxt in sorted(adj.get(term, ())):
            if nxt not in path:
                dfs(path + [nxt])

    dfs([source])
    return sorted(out)


EDGES = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]


def _got(spark, edges, directed, source, to, cutoff):
    g = Graph(spark.createDataFrame(edges, "src long, dst long"),
              directed=directed)
    df = get_all_simple_paths(g, source, to=to,
                              mode="out" if directed else "all",
                              cutoff=cutoff)
    return sorted(tuple(r["path"]) for r in df.collect())


def test_directed_all_targets(spark):
    assert _got(spark, EDGES, True, 0, None, None) == \
        _brute(EDGES, True, 0, None, None)


def test_directed_single_target_cutoff(spark):
    assert _got(spark, EDGES, True, 0, [4], 3) == \
        _brute(EDGES, True, 0, {4}, 3)


def test_undirected_matches_brute(spark):
    assert _got(spark, EDGES, False, 4, [0], None) == \
        _brute(EDGES, False, 4, {0}, None)


def test_ring_two_paths(spark):
    ring = [(i, (i + 1) % 6) for i in range(6)]
    got = _got(spark, ring, False, 0, [3], None)
    assert got == _brute(ring, False, 0, {3}, None)
    assert len(got) == 2          # clockwise + counterclockwise


def test_unreachable_empty(spark):
    got = _got(spark, [(0, 1), (2, 3)], True, 0, [3], None)
    assert got == []
