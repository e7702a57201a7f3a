"""Partition comparison metrics — igraph_compare_communities
(/root/reference/src/community.c:3071-3500): NMI (Danon et al. 2005),
variation of information (Meila 2003), Rand / adjusted Rand (Hubert &
Arabie 1985), split-join distance (van Dongen 2000).

All are aggregates over the contingency table of two label columns —
one join + one groupBy, pure Catalyst.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import ID

METHODS = ("nmi", "vi", "rand", "adjusted_rand", "split_join")


def _normalize(m: DataFrame, label_alias: str) -> DataFrame:
    return m.select(F.col(m.columns[0]).cast("long").alias(ID),
                    F.col(m.columns[1]).cast("long").alias(label_alias))


def compare_communities(m1: DataFrame, m2: DataFrame,
                        method: str = "nmi") -> float:
    """Compare two memberships DataFrame(id, label) -> scalar.

    method: 'nmi' | 'vi' | 'rand' | 'adjusted_rand' | 'split_join'.
    Vertices present in only one membership are dropped (inner join),
    like the reference's requirement of equal-length vectors.
    """
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; one of {METHODS}")
    j = _normalize(m1, "l1").join(_normalize(m2, "l2"), ID)
    cont = j.groupBy("l1", "l2").agg(F.count("*").alias("nij")).persist()
    try:
        n = int(cont.agg(F.sum("nij")).first()[0] or 0)
        if n == 0:
            raise ValueError("empty membership overlap")
        a = cont.groupBy("l1").agg(F.sum("nij").alias("ai"))
        b = cont.groupBy("l2").agg(F.sum("nij").alias("bj"))

        if method in ("nmi", "vi"):
            h1 = -sum(r.ai / n * math.log(r.ai / n) for r in a.collect())
            h2 = -sum(r.bj / n * math.log(r.bj / n) for r in b.collect())
            mi_row = (cont.join(a, "l1").join(b, "l2")
                      .agg(F.sum((F.col("nij") / n)
                                 * F.log((F.col("nij") * F.lit(float(n)))
                                         / (F.col("ai") * F.col("bj"))))
                           .alias("mi")).first())
            mi = float(mi_row.mi or 0.0)
            if method == "vi":
                return h1 + h2 - 2.0 * mi
            if h1 + h2 == 0.0:   # both partitions trivial => identical
                return 1.0
            return 2.0 * mi / (h1 + h2)

        c2 = lambda c: c * (c - 1) / 2.0  # noqa: E731
        sum_ij = float(cont.agg(F.sum(c2(F.col("nij")))).first()[0] or 0.0)
        sum_a = float(a.agg(F.sum(c2(F.col("ai")))).first()[0] or 0.0)
        sum_b = float(b.agg(F.sum(c2(F.col("bj")))).first()[0] or 0.0)
        total = c2(float(n))
        if method == "rand":
            return (total + 2.0 * sum_ij - sum_a - sum_b) / total
        if method == "adjusted_rand":
            expected = sum_a * sum_b / total
            mx = 0.5 * (sum_a + sum_b)
            return (sum_ij - expected) / (mx - expected)
        # split_join: 2n - sum_i max_j nij - sum_j max_i nij
        ma = float(cont.groupBy("l1").agg(F.max("nij").alias("m"))
                   .agg(F.sum("m")).first()[0] or 0.0)
        mb = float(cont.groupBy("l2").agg(F.max("nij").alias("m"))
                   .agg(F.sum("m")).first()[0] or 0.0)
        return 2.0 * n - ma - mb
    finally:
        cont.unpersist()
