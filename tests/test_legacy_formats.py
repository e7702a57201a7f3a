"""Pajek / LGL / DIMACS / DL readers + writers (foreign.c:358,478,823
and foreign-dl-parser.y analogs).  Fixtures are written inline,
shaped exactly like the reference's examples/simple/*.net|*.lgl|*.dl
suite (pajek1/pajek6/pajek_signed, igraph_read_graph_lgl-1,
edgelist1/fullmatrix1/nodelist1) so structure can be asserted against
the published .out expectations without copying files."""

import os

from igraph_spark.graph import Graph
from igraph_spark.generators import famous
from igraph_spark.sources.readers import (
    read_dimacs, read_dl, read_lgl, read_pajek,
    write_dimacs, write_dot, write_lgl, write_pajek)


def _und(edges):
    return sorted(tuple(sorted(p)) for p in edges)


# ---------------------------------------------------------------- pajek

PAJEK_UND = """*Vertices 10
1 "Vert 1" 0 0 box x_fact 1 y_fact 1 ic Green
2 "Vert 2" 0 0 box x_fact 1 y_fact 1 ic Green
3 "Vert 3" 0 0 box
4 "Vert 4"
5 "Vert 5"
6 "Vert 6"
7 "Vert 7"
8 "Vert 8"
9 "Vert 9"
10 "Vert 10"
*Edges
1 2
2 3
3 4
4 5
5 6
6 7
7 8
8 9
9 10
"""


def test_pajek_undirected_ring_path(spark, tmp_path):
    p = os.path.join(str(tmp_path), "p1.net")
    with open(p, "w") as fh:
        fh.write(PAJEK_UND)
    g, names = read_pajek(spark, p)
    assert not g.directed
    assert g.vcount() == 10
    assert _und((r.src, r.dst) for r in g.edges.collect()) == \
        [(i, i + 1) for i in range(9)]
    nm = dict((r.id, r.name) for r in names.collect())
    assert nm[0] == "Vert 1" and nm[9] == "Vert 10"


def test_pajek_arcs_directed_weighted(spark, tmp_path):
    p = os.path.join(str(tmp_path), "p6.net")
    with open(p, "w") as fh:
        fh.write("*Vertices 4\n1 \"a\"\n2 \"b\"\n3 \"c\"\n4 \"d\"\n"
                 "*Arcs 3\n1 2 2.5\n2 3 1\n4 1 0.5\n")
    g, _ = read_pajek(spark, p)
    assert g.directed
    assert sorted((r.src, r.dst, r.weight) for r in g.edges.collect()) == \
        [(0, 1, 2.5), (1, 2, 1.0), (3, 0, 0.5)]


def test_pajek_matrix_signed(spark, tmp_path):
    # pajek_signed.net shape: *Matrix with +-1 entries, directed
    p = os.path.join(str(tmp_path), "sig.net")
    with open(p, "w") as fh:
        fh.write("*Vertices 3\n1 \"x\"\n2 \"y\"\n3 \"z\"\n*Matrix\n"
                 " 0 1 -1\n 0 0 1\n 1 0 0\n")
    g, _ = read_pajek(spark, p)
    assert g.directed
    got = sorted((r.src, r.dst, r.weight) for r in g.edges.collect())
    assert got == [(0, 1, 1.0), (0, 2, -1.0), (1, 2, 1.0), (2, 0, 1.0)]


def test_pajek_edgeslist_and_isolates(spark, tmp_path):
    p = os.path.join(str(tmp_path), "el.net")
    with open(p, "w") as fh:
        fh.write("*Vertices 5\n1 \"a\"\n2 \"b\"\n3 \"c\"\n4 \"d\"\n"
                 "5 \"iso\"\n*Edgeslist\n1 2 3\n4 1\n")
    g, names = read_pajek(spark, p)
    assert not g.directed
    assert g.vcount() == 5  # isolate survives via *Vertices count
    assert _und((r.src, r.dst) for r in g.edges.collect()) == \
        [(0, 1), (0, 2), (0, 3)]
    assert names.count() == 5


def test_pajek_round_trip_karate(spark, tmp_path):
    k = famous(spark, "Zachary")
    p = os.path.join(str(tmp_path), "k.net")
    write_pajek(k, None, p)
    g2, _ = read_pajek(spark, p)
    assert not g2.directed
    assert _und((r.src, r.dst) for r in g2.edges.collect()) == \
        _und((r.src, r.dst) for r in k.edges.collect())


# ------------------------------------------------------------------ lgl

LGL_1 = "# foo\nbar \nfoobar 5\n# foobar\nbat \ntab\n# tab\n"


def test_lgl_reference_fixture_shape(spark, tmp_path):
    p = os.path.join(str(tmp_path), "g.lgl")
    with open(p, "w") as fh:
        fh.write(LGL_1)
    g, names = read_lgl(spark, p)
    nm = dict((r.id, r.name) for r in names.collect())
    got = _und((nm[r.src], nm[r.dst]) for r in g.edges.collect())
    assert got == _und([("foo", "bar"), ("foo", "foobar"),
                        ("foobar", "bat"), ("foobar", "tab")])
    # mixed weighted/unweighted lines: missing weights default to 1
    w = {frozenset((nm[r.src], nm[r.dst])): r.weight
         for r in g.edges.collect()}
    assert w[frozenset(("foo", "foobar"))] == 5.0
    assert w[frozenset(("foo", "bar"))] == 1.0


def test_lgl_round_trip(spark, tmp_path):
    g = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (2, 3)], n=5, directed=False)  # 4 isolated
    p = os.path.join(str(tmp_path), "rt.lgl")
    write_lgl(g, None, p)
    g2, names = read_lgl(spark, p)
    nm = dict((r.id, int(r.name)) for r in names.collect())
    assert _und((nm[r.src], nm[r.dst]) for r in g2.edges.collect()) == \
        _und([(0, 1), (0, 2), (2, 3)])
    assert names.count() == 5  # isolate written as lone '# 4' block


# --------------------------------------------------------------- dimacs

def test_dimacs_max_flow_round_trip(spark, tmp_path):
    p = os.path.join(str(tmp_path), "f.dimacs")
    with open(p, "w") as fh:
        fh.write("c comment line\np max 4 5\nn 1 s\nn 4 t\n"
                 "a 1 2 3\na 1 3 2\na 2 3 1\na 2 4 2\na 3 4 3\n")
    g, s, t = read_dimacs(spark, p)
    assert g.directed and (s, t) == (0, 3)
    assert g.vcount() == 4
    assert sorted((r.src, r.dst, r.weight) for r in g.edges.collect()) == \
        [(0, 1, 3.0), (0, 2, 2.0), (1, 2, 1.0), (1, 3, 2.0), (2, 3, 3.0)]
    # max flow = 5: s->a->t (2), s->b->t (2), s->a->b->t (1)
    from igraph_spark.algorithms.flow import maxflow
    assert abs(maxflow(g, s, t)["value"] - 5.0) < 1e-9

    p2 = os.path.join(str(tmp_path), "out.dimacs")
    write_dimacs(g, p2, source=s, target=t)
    g2, s2, t2 = read_dimacs(spark, p2)
    assert (s2, t2) == (s, t)
    assert sorted((r.src, r.dst, r.weight) for r in g2.edges.collect()) == \
        sorted((r.src, r.dst, r.weight) for r in g.edges.collect())


def test_dimacs_edge_format(spark, tmp_path):
    p = os.path.join(str(tmp_path), "e.col")
    with open(p, "w") as fh:
        fh.write("c a coloring instance\np edge 3 2\ne 1 2\ne 2 3\n")
    g, s, t = read_dimacs(spark, p, directed=False)
    assert s is None and t is None
    assert _und((r.src, r.dst) for r in g.edges.collect()) == [(0, 1), (1, 2)]


# ------------------------------------------------------------------- dl

DL_EDGELIST = ("DL n=5\nformat = edgelist1\nlabels:\n"
               "george, sally, jim, billy, jane\ndata:\n"
               "1 2\n1 3\n2 3\n3 1\n4 3\n")

DL_FULLMATRIX = ("DL N = 5\nData:\n"
                 "0 1 1 1 1\n1 0 1 0 0\n1 1 0 0 1\n"
                 "1 0 0 0 0\n1 0 1 0 0\n")

DL_NODELIST = ("DL n=5\nformat = nodelist1\nlabels:\n"
               "george, sally, jim, billy, jane\ndata:\n"
               "1 2 3\n2 3\n3 1\n4 3\n")

DL_EMBEDDED = ("DL n=5\nformat = edgelist1\nlabels:\n"
               "george, sally, jim, billy, jane\nlabels embedded:\ndata:\n"
               "george sally\ngeorge jim\nsally jim\nbilly george\n"
               "jane jim\n")


def test_dl_edgelist1(spark, tmp_path):
    p = os.path.join(str(tmp_path), "e.dl")
    with open(p, "w") as fh:
        fh.write(DL_EDGELIST)
    g, names = read_dl(spark, p)
    assert g.directed and g.vcount() == 5
    assert sorted((r.src, r.dst) for r in g.edges.collect()) == \
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    assert [r.name for r in names.orderBy("id").collect()] == \
        ["george", "sally", "jim", "billy", "jane"]


def test_dl_fullmatrix_matches_reference_out(spark, tmp_path):
    # fullmatrix1.dl -> igraph_read_graph_dl.out first block
    p = os.path.join(str(tmp_path), "m.dl")
    with open(p, "w") as fh:
        fh.write(DL_FULLMATRIX)
    g, _ = read_dl(spark, p)
    assert sorted((r.src, r.dst) for r in g.edges.collect()) == \
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 0), (1, 2), (2, 0), (2, 1),
         (2, 4), (3, 0), (4, 0), (4, 2)]


def test_dl_nodelist_and_embedded(spark, tmp_path):
    p = os.path.join(str(tmp_path), "n.dl")
    with open(p, "w") as fh:
        fh.write(DL_NODELIST)
    g, _ = read_dl(spark, p)
    assert sorted((r.src, r.dst) for r in g.edges.collect()) == \
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]

    p2 = os.path.join(str(tmp_path), "emb.dl")
    with open(p2, "w") as fh:
        fh.write(DL_EMBEDDED)
    g2, _ = read_dl(spark, p2)
    assert sorted((r.src, r.dst) for r in g2.edges.collect()) == \
        [(0, 1), (0, 2), (1, 2), (3, 0), (4, 2)]


# ------------------------------------------------------------------ dot

def test_write_dot_shape(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=True)
    p = os.path.join(str(tmp_path), "g.dot")
    write_dot(g, None, p)
    txt = open(p).read()
    assert txt.startswith("digraph G {")
    assert "0 -> 1;" in txt and "1 -> 2;" in txt and txt.rstrip().endswith("}")


# -------------------------------------------------------------- graphdb

def test_graphdb_round_trip(spark, tmp_path):
    from igraph_spark.sources.readers import read_graphdb, write_graphdb
    g = famous(spark, "Zachary")
    p = str(tmp_path / "karate.graph")
    write_graphdb(g, p)
    g2 = read_graphdb(spark, p, directed=False)
    orig = _und((int(r["src"]), int(r["dst"]))
                for r in g.edges.collect())
    back = _und((int(r["src"]), int(r["dst"]))
                for r in g2.edges.collect())
    assert back == orig
    assert g2.vcount() == g.vcount()


def test_graphdb_binary_layout(spark, tmp_path):
    """First word = n, then per-vertex (count, targets) 16-bit LE —
    foreign.c:927 byte-for-byte."""
    import struct
    from igraph_spark.sources.readers import read_graphdb
    # 3 vertices: 0->{1,2}, 1->{2}, 2->{}
    p = tmp_path / "tiny.graph"
    p.write_bytes(struct.pack("<H", 3) + struct.pack("<HHH", 2, 1, 2)
                  + struct.pack("<HH", 1, 2) + struct.pack("<H", 0))
    g = read_graphdb(spark, str(p), directed=True)
    got = sorted((int(r["src"]), int(r["dst"]))
                 for r in g.edges.collect())
    assert got == [(0, 1), (0, 2), (1, 2)]


def test_graphdb_db_directory(spark, tmp_path):
    from igraph_spark.sources.readers import (read_graphdb_db,
                                              write_graphdb)
    from igraph_spark.graph import Graph
    a = Graph(spark.createDataFrame([(0, 1), (1, 2)],
                                    "src long, dst long"), directed=True)
    b = Graph(spark.createDataFrame([(0, 1)],
                                    "src long, dst long"), directed=True)
    write_graphdb(a, str(tmp_path / "a.graph"))
    write_graphdb(b, str(tmp_path / "b.graph"))
    db = read_graphdb_db(spark, str(tmp_path) + "/*.graph")
    per = {os.path.basename(r["gid"]): int(r["n"]) for r in
           db.groupBy("gid").count().withColumnRenamed("count", "n")
           .collect()}
    assert per == {"a.graph": 2, "b.graph": 1}


def test_graphdb_truncated_raises(spark, tmp_path):
    """igraph_read_graph_graphdb raises 'Truncated graphdb file'
    (foreign.c) instead of keeping a parseable prefix; so do we, with
    the file named in the error — for empty blobs, a word stream that
    ends before all vertices are read, and a vertex whose declared
    target count overruns the stream."""
    import struct
    import pytest
    from igraph_spark.sources.readers import read_graphdb

    cases = {
        # odd-length blob (a zero-byte file is skipped by the
        # binaryFile source itself, so 1 byte is the smallest
        # observable truncation)
        "empty.graph": b"\x01",
        # declares 3 vertices, stream ends after vertex 0
        "short.graph": struct.pack("<H", 3) + struct.pack("<HHH", 2, 1, 2),
        # vertex 0 declares 5 targets, only 2 present
        "overrun.graph": struct.pack("<H", 1) + struct.pack("<HHH", 5, 1, 2),
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        with pytest.raises(Exception) as ei:
            read_graphdb(spark, str(p), directed=True).edges.collect()
        msg = str(ei.value)
        assert "Truncated graphdb file" in msg and name in msg


def test_write_colored_graph(spark, tmp_path):
    from igraph_spark.graph import Graph
    from igraph_spark.sources.readers import write_colored_graph
    g = Graph(spark.createDataFrame([(0, 1), (1, 2)],
                                    "src long, dst long"), directed=False)
    vc = spark.createDataFrame([(0, 5), (1, 6), (2, 5)],
                               "id long, vcolor long")
    p = str(tmp_path / "g.cg")
    write_colored_graph(g, p, vcolors=vc)
    lines = open(p).read().splitlines()
    assert lines == ["v 0 5", "v 1 6", "v 2 5", "e 0 1", "e 1 2"]
