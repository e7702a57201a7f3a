"""Golden PageRank fixtures from the reference's own test program
(/root/reference/examples/simple/igraph_pagerank.c, FIXTURES.md §3.1),
checked allclose(1e-6) against the independent NumPy oracle and — for
pr4 — against the printed golden values of igraph_pagerank.out.
"""

import numpy as np
import pytest

from igraph_spark.graph import Graph
from igraph_spark.algorithms.pagerank import pagerank, personalized_pagerank
from igraph_spark.generators import famous

from tests.oracle import pagerank_oracle

PR4 = [(0, 1), (1, 2), (2, 0), (3, 2), (0, 2)]  # igraph_pagerank.c:54-60
PR8 = ([(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0)]
       + [(3, 4), (3, 5), (3, 6), (3, 7)]
       + [(4, 0), (5, 0), (6, 0), (7, 0)])      # igraph_pagerank.c:71-86
STAR11 = [(0, i) for i in range(1, 11)]          # igraph_pagerank.c:98
PR9W_EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
              (5, 6), (6, 7), (7, 8), (8, 0)]
PR9W_W = [4.0, 5.0, 5.0, 4.0, 4.0, 4.0, 3.0, 4.0, 4.0]  # bug #792352 fixture


def _scores(df, n):
    rows = {r["id"]: r["pagerank"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_pr4_directed_with_dangling(spark):
    g = Graph.from_edge_list(spark, PR4, n=4, directed=True)
    got = _scores(pagerank(g, tol=1e-10), 4)
    want = pagerank_oracle(4, PR4, directed=True)
    assert np.allclose(got, want, atol=1e-6)
    # cross-check against the reference golden print "%4.2f"
    # (igraph_pagerank.out:2)
    assert [round(x, 2) for x in got] == [0.37, 0.20, 0.39, 0.04]


def test_pr8_two_hubs(spark):
    g = Graph.from_edge_list(spark, PR8, n=8, directed=True)
    got = _scores(pagerank(g, tol=1e-10), 8)
    want = pagerank_oracle(8, PR8, directed=True)
    assert np.allclose(got, want, atol=1e-6)
    assert round(got[0], 2) == 0.42  # igraph_pagerank.out:4


def test_star11_undirected(spark):
    g = Graph.from_edge_list(spark, STAR11, n=11, directed=False)
    got = _scores(pagerank(g, tol=1e-10), 11)
    want = pagerank_oracle(11, STAR11, directed=False)
    assert np.allclose(got, want, atol=1e-6)
    assert round(got[0], 2) == 0.47  # igraph_pagerank.out:5-10


def test_star11_personalized(spark):
    reset = {i: 0.0 for i in range(11)}
    reset[1] = 1.0
    g = Graph.from_edge_list(spark, STAR11, n=11, directed=False)
    got = _scores(personalized_pagerank(g, damping=0.5, reset=reset,
                                        tol=1e-10), 11)
    oracle_reset = np.zeros(11)
    oracle_reset[1] = 1.0
    want = pagerank_oracle(11, STAR11, directed=False, damping=0.5,
                           reset=oracle_reset)
    assert np.allclose(got, want, atol=1e-6)
    # igraph_pagerank.out:11-12 prints 0.33 0.52 then 0.02 x9
    assert [round(got[0], 2), round(got[1], 2)] == [0.33, 0.52]


def test_empty_graph(spark):
    g = Graph.from_edge_list(spark, [], n=10, directed=True)
    got = _scores(pagerank(g), 10)
    assert np.allclose(got, np.full(10, 0.1), atol=1e-12)


def test_full10_zero_weights(spark):
    edges = [(i, j) for i in range(10) for j in range(10) if i != j]
    g = Graph.from_edge_list(spark, edges, n=10, directed=True,
                             weights=[0.0] * len(edges))
    got = _scores(pagerank(g, weights=True), 10)
    assert np.allclose(got, np.full(10, 0.1), atol=1e-12)


def test_pr9_weighted(spark):
    g = Graph.from_edge_list(spark, PR9W_EDGES, n=9, directed=True,
                             weights=PR9W_W)
    got = _scores(pagerank(g, weights=True, tol=1e-10), 9)
    want = pagerank_oracle(9, PR9W_EDGES, directed=True, weights=PR9W_W)
    assert np.allclose(got, want, atol=1e-6)


def test_loop_semantics_unweighted(spark):
    # loop at 0 is excluded from out-degree but retained in adjacency
    edges = [(0, 0), (0, 1), (1, 0), (1, 2), (2, 0)]
    g = Graph.from_edge_list(spark, edges, n=3, directed=True)
    got = _scores(pagerank(g, tol=1e-10), 3)
    want = pagerank_oracle(3, edges, directed=True)
    assert np.allclose(got, want, atol=1e-6)


def test_karate_pagerank(spark):
    g = famous(spark, "Zachary")
    got = _scores(pagerank(g, tol=1e-10), 34)
    from igraph_spark.generators import KARATE_EDGES
    want = pagerank_oracle(34, KARATE_EDGES, directed=False)
    assert np.allclose(got, want, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_reset_validation(spark):
    g = Graph.from_edge_list(spark, STAR11, n=11, directed=False)
    with pytest.raises(ValueError):
        personalized_pagerank(g, reset={0: -1.0, 1: 2.0})
    with pytest.raises(ValueError):
        personalized_pagerank(g, reset={0: 0.0})


def test_resume_from_checkpoint(spark, tmp_path):
    run_dir = str(tmp_path / "pr_run")
    g = Graph.from_edge_list(spark, PR8, n=8, directed=True)
    # truncated run: few iterations, checkpoint manifest written
    partial = pagerank(g, tol=1e-10, max_iter=20, check_every=5,
                       run_dir=run_dir)
    partial.collect()
    # resumed run picks up from the manifest and converges
    full = pagerank(g, tol=1e-10, max_iter=300, check_every=5,
                    run_dir=run_dir)
    got = _scores(full, 8)
    want = pagerank_oracle(8, PR8, directed=True)
    assert np.allclose(got, want, atol=1e-6)


def test_resume_rejects_stale_state_schema(spark, tmp_path):
    """A durable manifest written by an older code version (state
    schema (id, pr), params without the version marker) must NOT be
    resumed: the params no longer match (pagerank now stamps
    "state": 2), and even a params-forged manifest is rejected by the
    runner's column validation (checkpointing.start)."""
    import json, os
    run_dir = str(tmp_path / "pr_stale")
    g = Graph.from_edge_list(spark, PR8, n=8, directed=True)
    # forge an old-version manifest: state parquet WITHOUT the
    # dangling/reset columns, params copied from what the current code
    # would write (so only the column check can reject it)
    os.makedirs(run_dir)
    old_state = spark.createDataFrame(
        [(i, 1.0 / 8) for i in range(8)], "id long, pr double")
    state_path = os.path.join(run_dir, "state_000004")
    old_state.write.parquet(state_path)
    manifest = {
        "superstep": 4, "state_path": state_path, "partitions": [],
        "history": [{"superstep": s} for s in range(5)],
        "params": {"algo": "pagerank", "damping": 0.85, "tol": 1e-10,
                   "weighted": False, "n": 8, "state": 2},
    }
    with open(os.path.join(run_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    # must fall back to a fresh run and still converge correctly
    full = pagerank(g, tol=1e-10, max_iter=300, check_every=5,
                    run_dir=run_dir)
    got = _scores(full, 8)
    want = pagerank_oracle(8, PR8, directed=True)
    assert np.allclose(got, want, atol=1e-6)


def test_durable_manifest_history_carries_delta(spark, tmp_path):
    """update_metrics must rewrite the durable manifest so checkpointed
    supersteps keep their convergence metric (a resumed run's history
    must match a straight run's — the manifest audit contract)."""
    import json, os
    run_dir = str(tmp_path / "pr_metrics")
    g = Graph.from_edge_list(spark, PR8, n=8, directed=True)
    pagerank(g, tol=1e-10, max_iter=20, check_every=5, run_dir=run_dir)
    with open(os.path.join(run_dir, "manifest.json")) as fh:
        man = json.load(fh)
    assert man["history"], "manifest should carry superstep history"
    for rec in man["history"]:
        assert "delta" in rec, (
            f"superstep {rec['superstep']} missing delta in the durable "
            "manifest — advance() serialized history before the metric "
            "was measured and update_metrics did not rewrite it")


def test_manifest_never_holds_future_supersteps(spark, tmp_path):
    """update_metrics for a step AFTER the manifest's checkpointed
    superstep must not rewrite the manifest: a resumed run restarts at
    manifest.superstep + 1 and re-runs those steps, so pre-persisted
    records for them would duplicate on resume (the exact divergence
    the audit contract forbids)."""
    import json, os
    from igraph_spark.checkpointing import SuperstepRunner
    run_dir = str(tmp_path / "runner")
    r = SuperstepRunner(spark, run_dir=run_dir, checkpoint_every=5)
    state, first, _ = r.start(spark.range(4).toDF("id"),
                              params={"algo": "t", "v": 1})
    assert first == 0
    for step in range(7):  # durable at step 4 (…+1 % 5 == 0)
        state = r.advance(step, state.selectExpr("id"))
        r.update_metrics(step, {"delta": float(step)})
    with open(os.path.join(run_dir, "manifest.json")) as fh:
        man = json.load(fh)
    assert man["superstep"] == 4
    steps = [rec["superstep"] for rec in man["history"]]
    assert steps == list(range(5)), (
        f"manifest at superstep 4 must hold history 0..4 only, got {steps}")
    # the checkpointed step's late metric DID land
    assert man["history"][4]["delta"] == 4.0
    # resume: history comes back clean, next step is 5
    r2 = SuperstepRunner(spark, run_dir=run_dir, checkpoint_every=5)
    state2, first2, hist2 = r2.start(spark.range(4).toDF("id"),
                                     params={"algo": "t", "v": 1})
    assert first2 == 5
    assert [rec["superstep"] for rec in hist2] == list(range(5))
    # re-running steps 5-6 appends exactly one record each
    for step in range(5, 7):
        state2 = r2.advance(step, state2.selectExpr("id"))
        r2.update_metrics(step, {"delta": float(step)})
    assert [rec["superstep"] for rec in r2.history] == list(range(7))
