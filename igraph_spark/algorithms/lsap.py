"""Linear sum assignment — igraph_solve_lsap
(/root/reference/src/lsap.c, exposing the classic Hungarian/
shortest-augmenting-path solver).

An n x n assignment is a dense sequential optimization (every
augmenting path conditions on the full potential vector), so like the
reference this is a driver core over numpy, gated by
``max_driver_n``.  The Spark surface accepts the cost matrix as a COO
DataFrame(row, col, cost) — missing entries default to ``fill`` — and
returns the matching as a DataFrame, so the costs can be produced by
any distributed pipeline (e.g. a similarity join) before the small
dense solve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _hungarian(a) -> list:
    """Shortest-augmenting-path Hungarian method with potentials
    (Kuhn-Munkres / Jonker-Volgenant family), O(n^3).  ``a`` is a
    square numpy cost matrix; returns col assigned to each row."""
    import numpy as np

    n = a.shape[0]
    INF = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)   # p[j] = row matched to col j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            for j in range(1, n + 1):
                if used[j]:
                    continue
                cur = a[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    ans = [0] * n
    for j in range(1, n + 1):
        if p[j] > 0:
            ans[p[j] - 1] = j - 1
    return ans


def solve_lsap(costs: DataFrame, n: int | None = None,
               fill: float = 0.0, max_driver_n: int = 2000) -> DataFrame:
    """igraph_solve_lsap (lsap.c): minimum-cost perfect assignment of n
    rows to n columns -> DataFrame(row, col).

    ``costs``: DataFrame(row, col, cost); ``n`` defaults to
    1 + max(row, col) over the entries; absent pairs cost ``fill``."""
    import numpy as np

    spark = costs.sparkSession
    rows = costs.collect()
    if n is None:
        n = 1 + max(max(int(r[0]) for r in rows),
                    max(int(r[1]) for r in rows)) if rows else 0
    if n == 0:
        return spark.createDataFrame([], "row long, col long")
    if n > max_driver_n:
        raise ValueError(
            f"LSAP is a dense sequential solve: n={n} > "
            f"max_driver_n={max_driver_n}")
    a = np.full((n, n), float(fill))
    for r in rows:
        a[int(r[0]), int(r[1])] = float(r[2])
    ans = _hungarian(a)
    return spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(ans)], "row long, col long")
