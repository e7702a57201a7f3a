"""Per-partition CSR block kernel (north rule: "adjacency materialized
as per-partition CSR blocks with explicit hash-partitioning on src").

The Spark analog of igraph's indexed edge list
(/root/reference/src/type_indexededgelist.c:835-877): edges are
hash-bucketed on ``src`` into P blocks; inside each block the matvec
runs as a vectorized numpy kernel over Arrow batches — sources
factorized against the co-grouped vertex-state block, flows
accumulated with ``np.bincount`` (a dense CSR-style gather/scatter),
emitting per-block *partial* dst flows (map-side combine in numpy).
A final hash aggregation on dst completes the superstep.

Trade-off vs the default JVM join+agg kernel (kept as the default):
Arrow re-ships each block's edges to the Python worker every
superstep, so the CSR path wins when per-edge compute is heavy or
Python-side logic is unavoidable, while the codegen'd join wins for
the plain multiply-add.  Both produce bit-compatible flows (tested in
tests/test_csr_kernel.py); ``pagerank(kernel="csr")`` switches.
"""

from __future__ import annotations


import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

PK = "pk"


def with_block_key(df: DataFrame, col: str, num_blocks: int) -> DataFrame:
    """Stable hash-bucket key: pmod(xxhash64(col), P) — deterministic at
    any parallelism, same bucketing for edges (by src) and state (by id)."""
    return df.withColumn(PK, F.pmod(F.xxhash64(F.col(col)),
                                    F.lit(num_blocks)).cast("int"))


def _block_matvec(state_pdf: pd.DataFrame,
                  links_pdf: pd.DataFrame) -> pd.DataFrame:
    """One block: flow[dst] = sum over block edges of nw * pr[src]."""
    if len(links_pdf) == 0 or len(state_pdf) == 0:
        return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                             "flow": pd.Series([], dtype="float64")})
    pr = pd.Series(state_pdf["pr"].to_numpy(np.float64),
                   index=state_pdf["id"].to_numpy(np.int64))
    src_pr = pr.reindex(links_pdf["src"].to_numpy(np.int64)).to_numpy()
    # src ids outside this block's state slice carry no mass
    src_pr = np.nan_to_num(src_pr, nan=0.0)
    contrib = links_pdf["nw"].to_numpy(np.float64) * src_pr
    # CSR-style scatter-add: factorize dst, bincount the contributions
    codes, uniques = pd.factorize(links_pdf["dst"].to_numpy(np.int64),
                                  use_na_sentinel=False)
    flows = np.bincount(codes, weights=contrib, minlength=len(uniques))
    return pd.DataFrame({"dst": uniques.astype(np.int64), "flow": flows})


def csr_contrib(state: DataFrame, links_pk: DataFrame,
                num_blocks: int) -> DataFrame:
    """Superstep flow aggregation through the block kernel ->
    DataFrame(dst, flow).

    ``links_pk`` must already carry the block key (with_block_key on
    src); the state is co-grouped by the same key so each kernel call
    sees exactly the sources its edges need.
    """
    state_pk = with_block_key(state.select("id", "pr"), "id", num_blocks)

    def apply_fn(sp: pd.DataFrame, lp: pd.DataFrame) -> pd.DataFrame:
        return _block_matvec(sp, lp)

    partial = (state_pk.groupBy(PK)
               .cogroup(links_pk.groupBy(PK))
               .applyInPandas(apply_fn, schema="dst long, flow double"))
    return partial.groupBy("dst").agg(F.sum("flow").alias("flow"))


def _block_label_tally(state_pdf: pd.DataFrame,
                       links_pdf: pd.DataFrame) -> pd.DataFrame:
    """One block of the LPA sweep: per-(dst, neighbor-label) incident
    weight, pre-aggregated in numpy (map-side combine) so the shuffle
    carries one row per (dst, label) per block instead of one per edge."""
    if len(links_pdf) == 0 or len(state_pdf) == 0:
        return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                             "label": pd.Series([], dtype="int64"),
                             "w": pd.Series([], dtype="float64")})
    lab = pd.Series(state_pdf["label"].to_numpy(), dtype="float64")
    lab.index = state_pdf["id"].to_numpy(np.int64)
    src_lab = lab.reindex(links_pdf["src"].to_numpy(np.int64)).to_numpy()
    keep = ~np.isnan(src_lab)  # unlabeled neighbors carry no vote
    if not keep.any():
        return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                             "label": pd.Series([], dtype="int64"),
                             "w": pd.Series([], dtype="float64")})
    dst = links_pdf["dst"].to_numpy(np.int64)[keep]
    labv = src_lab[keep].astype(np.int64)
    wv = links_pdf["w"].to_numpy(np.float64)[keep]
    # factorize the (dst, label) pair and bincount the weights
    pair = pd.MultiIndex.from_arrays([dst, labv])
    codes, uniques = pd.factorize(pair, use_na_sentinel=False)
    sums = np.bincount(codes, weights=wv, minlength=len(uniques))
    out_dst = uniques.get_level_values(0).to_numpy(np.int64)
    out_lab = uniques.get_level_values(1).to_numpy(np.int64)
    return pd.DataFrame({"dst": out_dst, "label": out_lab, "w": sums})


def csr_label_tally(state: DataFrame, links_pk: DataFrame,
                    num_blocks: int) -> DataFrame:
    """LPA sweep tally through the CSR block kernel ->
    DataFrame(dst, label, w): total incident weight per neighbor label.

    ``state``: DataFrame(id, label) (label nullable); ``links_pk``:
    (src, dst, w) already carrying the block key on src.  Same
    cogrouped-blocks shape as ``csr_contrib`` — the heavy per-edge
    label gather runs vectorized in Arrow batches, and each block
    emits pre-combined (dst, label) partials."""
    state_pk = with_block_key(state.select("id", "label"), "id", num_blocks)

    def apply_fn(sp: pd.DataFrame, lp: pd.DataFrame) -> pd.DataFrame:
        return _block_label_tally(sp, lp)

    partial = (state_pk.groupBy(PK)
               .cogroup(links_pk.groupBy(PK))
               .applyInPandas(apply_fn, schema="dst long, label long, w double"))
    return partial.groupBy("dst", "label").agg(F.sum("w").alias("w"))
