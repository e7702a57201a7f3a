"""Dynamic velist parsing + union-graph projection vs a brute-force
snapshot oracle (reference: src/dynamic.c:75,568,1033)."""

from igraph_spark.algorithms.dynamic_graphs import (
    read_dynamic_velist, snapshot_edges, union_graph_projection,
    project_dynamic, evomine)

# edge log: (src, dst, t_create, t_delete)   -1 = never deleted
LOG = [
    (0, 1, 0, -1),     # persistent
    (1, 2, 0, 2),      # vanishes at t=2
    (2, 3, 1, 3),      # appears at 1, gone at 3
    (0, 1, 5, -1),     # unreachable duplicate interval (T below caps)
    (3, 4, 2, -1),
]
T = 4


def _alive(t):
    return {(s, d) for s, d, c, dl in LOG
            if c <= t and (dl < 0 or t < dl)}


def _brute_transitions():
    out = {}
    for t in range(T - 1):
        a, b = _alive(t), _alive(t + 1)
        for e in a | b:
            out[(t, *e)] = 2 * (e in a) + (e in b)
    return out


def _log_df(spark):
    return spark.createDataFrame(
        LOG, "src long, dst long, t_create long, t_delete long")


def test_snapshot_edges(spark):
    snaps = snapshot_edges(_log_df(spark), T)
    got = {(int(r["t"]), int(r["src"]), int(r["dst"]))
           for r in snaps.collect()}
    want = {(t, s, d) for t in range(T) for (s, d) in _alive(t)}
    assert got == want


def test_project_dynamic_matches_brute(spark):
    db = project_dynamic(_log_df(spark), T)
    got = {(int(r["gid"]), int(r["src"]), int(r["dst"])):
           int(r["ecolor"]) for r in db.collect()}
    assert got == _brute_transitions()


def test_union_graph_projection_pair(spark):
    e1 = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    e2 = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {(int(r["src"]), int(r["dst"])): int(r["ecolor"])
           for r in union_graph_projection(e1, e2).collect()}
    assert got == {(0, 1): 2, (1, 2): 3, (2, 3): 1}


def test_cross_interval_recreated_edge(spark):
    log = spark.createDataFrame([(0, 1, 0, 1), (0, 1, 1, -1)],
                                "src long, dst long, t_create long, "
                                "t_delete long")
    db = project_dynamic(log, 3)
    got = {(int(r["gid"])): int(r["ecolor"]) for r in db.collect()}
    # t=0: first interval alive at 0, second alive at 1 -> code 3
    assert got == {0: 3, 1: 3}


def test_colored_projection(spark):
    log = spark.createDataFrame(
        [(0, 1, 7, 0, 2), (1, 2, 5, 1, -1)],
        "src long, dst long, ecolor long, t_create long, t_delete long")
    db = project_dynamic(log, 3, max_ecolor=9)
    got = {(int(r["gid"]), int(r["src"]), int(r["dst"])):
           int(r["ecolor"]) for r in db.collect()}
    # (0,1) color 7 alive t=0,1: transition 0 -> 7*10+7=77;
    #   transition 1 -> alive at 1 not 2 -> 70
    # (1,2) color 5 alive t>=1: transition 0 -> 5; transition 1 -> 55
    assert got == {(0, 0, 1): 77, (1, 0, 1): 70,
                   (0, 1, 2): 5, (1, 1, 2): 55}


def test_velist_reader(spark, tmp_path):
    p = tmp_path / "g.velist"
    p.write_text("v 0\nv 1\nv 2\n"
                 "e 0 1 0 -1\n"
                 "e 1 2 0 2\n")
    verts, edges = read_dynamic_velist(spark, str(p))
    assert sorted(int(r["id"]) for r in verts.collect()) == [0, 1, 2]
    rows = {(int(r["src"]), int(r["dst"])): (int(r["t_create"]),
                                             int(r["t_delete"]))
            for r in edges.collect()}
    assert rows == {(0, 1): (0, -1), (1, 2): (0, 2)}


def test_evomine_finds_persistent_pattern(spark):
    found = evomine(_log_df(spark), T, min_supp=3, max_edges=1)
    # the persistent (0,1) edge yields transition code 3 in all 3
    # transitions -> the single-edge ecolor-3 pattern has support 3
    pats = {(fp.pattern.ecolors, fp.support) for fp in found}
    assert ((3,), 3) in pats


# --------------------------------------- transactions / stream writers


def test_read_transactions_velist_roundtrip(spark, tmp_path):
    from igraph_spark.algorithms.dynamic_graphs import (
        read_transactions_velist)
    p = str(tmp_path / "txn.txt")
    with open(p, "w") as fh:
        fh.write("t # 0 5\n")
        fh.write("v 0 1\nv 1 2\nv 2 1\n")
        fh.write("e 0 1 3\ne 1 2 4\n")
        fh.write("t # 1\n")
        fh.write("v 0 2\nv 1 1\n")
        fh.write("e 0 1 7\n")
    edges, vcolors, supps = read_transactions_velist(
        spark, p, has_vcolors=True, has_ecolors=True)
    got = sorted((r.gid, r.src, r.dst, r.ecolor) for r in edges.collect())
    assert got == [(0, 0, 1, 3), (0, 1, 2, 4), (1, 0, 1, 7)]
    vc = sorted((r.gid, r.id, r.vcolor) for r in vcolors.collect())
    assert vc == [(0, 0, 1), (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 1, 1)]
    sp = sorted((r.gid, r.t, r.supp) for r in supps.collect())
    assert sp == [(0, 0, 5), (1, 1, -1)]


def test_transactions_feed_gspan_support(spark, tmp_path):
    from igraph_spark.algorithms.dynamic_graphs import (
        read_transactions_velist)
    from igraph_spark.algorithms.fsm import Pattern, shallow_support
    p = str(tmp_path / "txn2.txt")
    with open(p, "w") as fh:
        for gid in range(3):
            fh.write(f"t # {gid}\n")
            fh.write("v 0\nv 1\nv 2\n")
            fh.write("e 0 1\n")
            if gid < 2:
                fh.write("e 1 2\n")
    edges, _, _ = read_transactions_velist(spark, p)
    # the 2-edge wedge pattern appears in gids 0 and 1 only
    pat = Pattern(edges=((0, 1), (1, 2)))
    supp = shallow_support(edges, pat)
    assert sorted(r.gid for r in supp.collect()) == [0, 1]


def test_write_avm_stream_invariants(spark, tmp_path):
    from igraph_spark.algorithms.dynamic_graphs import write_avm
    p = str(tmp_path / "avm.txt")
    write_avm(p, n=20, t=5, avg_degree=4, opinion_prior=0.5,
              rewiring_p=0.5, seed=3)
    blocks, ecounts, ops = 0, [], set()
    cur = 0
    for line in open(p):
        tok = line.split()
        if tok[0] == "t":
            blocks += 1
            ecounts.append(0)
        elif tok[0] == "e":
            ecounts[-1] += 1
        elif tok[0] == "v":
            ops.add(int(tok[2]))
    assert blocks == 6                      # t=0 .. t=5
    assert len(set(ecounts)) == 1           # rewiring preserves |E|
    assert ops <= {1, 2}
    # determinism
    p2 = str(tmp_path / "avm2.txt")
    write_avm(p2, n=20, t=5, avg_degree=4, opinion_prior=0.5,
              rewiring_p=0.5, seed=3)
    assert open(p).read() == open(p2).read()


def test_citing_evolved_network_growth(spark, tmp_path):
    from igraph_spark.algorithms.dynamic_graphs import (
        citing_evolved_network)
    p = str(tmp_path / "cite.txt")
    citing_evolved_network(p, t=4, n=6, edges_per_step=1, m=2.0, seed=7)
    ecounts = []
    for line in open(p):
        tok = line.split()
        if tok[0] == "t":
            ecounts.append(0)
        elif tok[0] == "e":
            ecounts[-1] += 1
            a, b = int(tok[1]), int(tok[2])
            assert b < a                     # citations point backward
    assert len(ecounts) == 5                 # t=0 .. t=4
    assert ecounts == sorted(ecounts)        # monotone growth
