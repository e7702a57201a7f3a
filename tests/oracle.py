"""Single-node NumPy oracles implementing the reference kernels
independently of the Spark code — used to generate known answers for
the golden fixture tests (FIXTURES.md §3).

The PageRank oracle transcribes the semantics of
/root/reference/src/centrality.c:913-1035 (see FIXTURES.md §3.1):
dangling mass to the jump pool, loops excluded from unweighted
out-degree but kept in the adjacency, weighted strength including
loops with negative clamping, final sum-normalization.
"""

from __future__ import annotations

import numpy as np


def pagerank_oracle(n, edges, directed=True, damping=0.85, weights=None,
                    reset=None, tol=1e-14, max_iter=20000):
    edges = list(edges)
    if weights is not None:
        weights = [float(w) for w in weights]
    trav = list(edges)
    tw = list(weights) if weights is not None else None
    if not directed:
        trav = trav + [(v, u) for (u, v) in edges]
        if tw is not None:
            tw = tw + tw

    if len(edges) == 0:
        return np.full(n, 1.0 / n)

    outdeg = np.zeros(n)
    if tw is None:
        for (u, v) in trav:
            if u != v:
                outdeg[u] += 1.0
    else:
        if max(tw) == 0 and min(tw) == 0:
            return np.full(n, 1.0 / n)
        for (u, v), w in zip(trav, tw):
            outdeg[u] += max(w, 0.0)

    if reset is None:
        r = np.full(n, 1.0 / n)
    else:
        r = np.asarray(reset, dtype=float)
        r = r / r.sum()

    p = np.full(n, 1.0 / n)
    d = damping
    for _ in range(max_iter):
        sumfrom = np.where(outdeg != 0, p * (1 - d), p).sum()
        tmp = np.divide(p, outdeg, out=np.zeros(n), where=outdeg != 0)
        new = np.zeros(n)
        if tw is None:
            for (u, v) in trav:
                new[v] += tmp[u]
        else:
            for (u, v), w in zip(trav, tw):
                new[v] += w * tmp[u]
        new = (d * new + sumfrom * r) / p.sum()
        if np.abs(new - p).max() < tol:
            p = new
            break
        p = new
    return p / p.sum()


def triangle_oracle(edges):
    """Brute-force triangle enumeration on the simplified undirected
    graph; returns (global_count, per_vertex dict)."""
    adj: dict[int, set[int]] = {}
    es = set()
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        es.add((a, b))
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for a, b in es:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted((a, b, c))))
    per_vertex: dict[int, int] = {}
    for t in tris:
        for v in t:
            per_vertex[v] = per_vertex.get(v, 0) + 1
    return len(tris), per_vertex


def components_oracle(n, edges):
    """Weak components with igraph label semantics: label = dense rank
    of component min id (components.c:120 seed-scan order)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    roots = [find(i) for i in range(n)]
    order = sorted(set(roots))
    rank = {r: i for i, r in enumerate(order)}
    return [rank[r] for r in roots]


def betweenness_oracle(n, edges, directed=False):
    """Single-node Brandes (independent of the Spark code)."""
    from collections import deque
    adj = {i: [] for i in range(n)}
    for u, v in edges:
        if u == v:
            continue
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    bc = [0.0] * n
    for s in range(n):
        sigma = [0.0] * n
        dist = [-1] * n
        preds = [[] for _ in range(n)]
        sigma[s], dist[s] = 1.0, 0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in set(adj[v]):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = [0.0] * n
        for w in reversed(order):
            for v in set(preds[w]):
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    if not directed:
        bc = [x / 2 for x in bc]
    return bc
