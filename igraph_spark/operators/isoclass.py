"""Graph isomorphism classes for 3- and 4-vertex graphs —
igraph_isoclass / igraph_isoclass_create / igraph_graph_count
(/root/reference/src/topology.c:696,862,640).

The reference ships pregenerated code->class tables
(igraph_i_isoclass* — topology.c:35-626); here they are DERIVED at
first use from the same convention those tables encode: the adjacency
matrix is traversed column-major with the first cell as the least
significant bit (verified against igraph_i_isoclass_3_idx /
_4_idx:44,364), the canonical code of a graph is the MINIMUM over all
vertex permutations, and classes are numbered ascending by canonical
code (validated against the reference's directed-3 census reorder,
undirected-4 fixtures, and the directed-4 class count of 218 —
igraph_subisomorphic_lad.c:95)."""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import SparkSession, functions as F

from igraph_spark.graph import Graph, SRC, DST, ID

_CACHE: dict[tuple[int, bool], tuple] = {}


def _pairs(size: int, directed: bool):
    if directed:
        return [(r, c) for c in range(size) for r in range(size) if r != c]
    return [(r, c) for c in range(size) for r in range(c)]


def _tables(size: int, directed: bool):
    """-> (pairs, code2class list, class->canonical-code list)."""
    if size not in (3, 4):
        raise ValueError("isoclass tables exist for sizes 3 and 4 only "
                         "(the reference's limit too, topology.c:705)")
    key = (size, directed)
    if key in _CACHE:
        return _CACHE[key]
    pairs = _pairs(size, directed)
    pos = {p: i for i, p in enumerate(pairs)}
    nbits = len(pairs)

    def bitpos(i, j, pm):
        if directed:
            return pos[(pm[i], pm[j])]
        a, b = pm[i], pm[j]
        return pos[(min(a, b), max(a, b))]

    perm_maps = [[bitpos(i, j, pm) for (i, j) in pairs]
                 for pm in permutations(range(size))]
    code2canon = []
    for code in range(1 << nbits):
        bits = [(code >> k) & 1 for k in range(nbits)]
        best = 1 << nbits
        for mp in perm_maps:
            v = 0
            for k in range(nbits):
                if bits[k]:
                    v |= 1 << mp[k]
            if v < best:
                best = v
        code2canon.append(best)
    classes = sorted(set(code2canon))
    cls_of = {c: i for i, c in enumerate(classes)}
    out = (pairs, [cls_of[c] for c in code2canon], classes)
    _CACHE[key] = out
    return out


def graph_count(size: int, directed: bool = False) -> int:
    """igraph_graph_count: number of isomorphism classes of graphs on
    ``size`` vertices (3u=4, 3d=16, 4u=11, 4d=218)."""
    return len(_tables(size, directed)[2])


def isoclass(graph: Graph) -> int:
    """igraph_isoclass: the isomorphism class of a 3- or 4-vertex
    graph (vertices taken in ascending id order as local 0..size-1)."""
    vids = sorted(int(r[0]) for r in graph.vertices.select(ID).collect())
    size = len(vids)
    pairs, code2cls, _ = _tables(size, graph.directed)
    pos = {p: i for i, p in enumerate(pairs)}
    idx = {v: i for i, v in enumerate(vids)}
    code = 0
    for r in (graph.edges.select(SRC, DST)
              .where(F.col(SRC) != F.col(DST)).distinct().collect()):
        i, j = idx[int(r[SRC])], idx[int(r[DST])]
        if graph.directed:
            code |= 1 << pos[(i, j)]
        else:
            code |= 1 << pos[(min(i, j), max(i, j))]
    return code2cls[code]


def isoclass_create(spark: SparkSession, size: int, number: int,
                    directed: bool = False) -> Graph:
    """igraph_isoclass_create: a representative graph of isomorphism
    class ``number``.  The representative is the decode of the
    class's canonical (minimum) code — possibly a different labeling
    than the reference's classedges tables, but the same class:
    isoclass(isoclass_create(c)) == c for every c."""
    pairs, _, classes = _tables(size, directed)
    if not 0 <= number < len(classes):
        raise ValueError(f"class number out of range 0..{len(classes)-1}")
    code = classes[number]
    edges = [(r, c) if directed else (c, r)
             for k, (r, c) in enumerate(pairs) if (code >> k) & 1]
    if edges:
        e = spark.createDataFrame(edges, "src long, dst long")
    else:
        e = spark.createDataFrame([], "src long, dst long")
    return Graph(e, spark.range(size).toDF(ID), directed=directed)
