"""General pagerank() operator (sparkdon/pipeline/clusters.py, round 11
— VERDICT r10 #6): dangling-node mass redistribution, per-iteration mass
conservation, and tolerance-based stopping, cross-checked against a
numpy dense-matrix reference on an asymmetric directed graph."""

import numpy as np
import pytest

from sparkdon.pipeline.clusters import pagerank

# asymmetric directed graph, 6 nodes; node 5 is DANGLING (no out-edges),
# node 4 has a single out-edge into the dangling node, node 0 is a hub
EDGES = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 2), (3, 4), (4, 5)]
N = 6


def np_pagerank(edges, n, damping=0.85, iters=20):
    out = np.zeros(n)
    for s, _t in edges:
        out[s] += 1
    dangling = out == 0
    r = np.ones(n) / n
    hist = []
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / out[s]
        dm = r[dangling].sum()
        r_new = (1 - damping) / n + damping * (contrib + dm / n)
        hist.append((np.abs(r_new - r).sum(), r_new.sum()))
        r = r_new
    return r, hist


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_matches_numpy_reference_with_dangling_mass(spark):
    want, _ = np_pagerank(EDGES, N, iters=12)
    got = {r.node: r.pr for r in
           pagerank(_edges_df(spark), max_iters=12).collect()}
    assert sorted(got) == list(range(N))
    for node in range(N):
        assert got[node] == pytest.approx(want[node], abs=1e-12)


def test_mass_conserved_every_iteration():
    _, hist = np_pagerank(EDGES, N, iters=20)
    for _delta, mass in hist:
        assert mass == pytest.approx(1.0, abs=1e-12)


def test_spark_mass_conserved_and_tolerance_stop(spark):
    history = []
    ranks = pagerank(_edges_df(spark), max_iters=50, tol=1e-10,
                     history=history)
    # converged well before the iteration cap
    assert 0 < len(history) < 50
    assert history[-1]["delta"] < 1e-10
    # every materialized round conserved total mass
    for h in history:
        assert h["mass"] == pytest.approx(1.0, abs=1e-9)
    # deltas shrink monotonically on this graph
    deltas = [h["delta"] for h in history]
    assert all(a >= b for a, b in zip(deltas, deltas[1:]))
    # the converged ranks agree with a long numpy run
    want, _ = np_pagerank(EDGES, N, iters=200)
    got = {r.node: r.pr for r in ranks.collect()}
    for node in range(N):
        assert got[node] == pytest.approx(want[node], abs=1e-8)


def test_parallel_edges_weight_contributions(spark):
    # (0,1) twice: node 0's out-degree is 3 and node 1 receives 2/3 of
    # node 0's rank share — the weighted-matrix semantics
    edges = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
    want, _ = np_pagerank(edges, 3, iters=8)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pr for r in pagerank(df, max_iters=8).collect()}
    for node in range(3):
        assert got[node] == pytest.approx(want[node], abs=1e-12)


def test_connected_components_public_api(spark):
    """connected_components over an arbitrary edge frame: chain,
    triangle, self-loop, and an isolated node supplied via nodes= —
    reps are each component's minimum id."""
    from sparkdon.pipeline.clusters import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
         (10, 11), (11, 12), (12, 10),    # triangle
         (20, 20)],                       # self-loop singleton
        "src long, dst long")
    nodes = spark.createDataFrame([(30,), (4,)], "node long")
    got = {r.node: r.rep for r in
           connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 30: 30}


def test_connected_components_string_ids(spark):
    """String node ids (URLs, content hashes) work — rep is the
    lexicographic minimum."""
    from sparkdon.pipeline.clusters import connected_components

    edges = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "src string, dst string")
    got = {r.node: r.rep for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_null_endpoint_fails_loudly(spark):
    """A null endpoint would silently vanish from the propagation joins
    and mis-assign its non-null end — the API raises instead."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from sparkdon.pipeline.clusters import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, None)], "src long, dst long")
    with pytest.raises(SparkRuntimeException, match="null dst"):
        connected_components(edges).collect()
    # same posture for the optional nodes= frame: a null node row would
    # otherwise pass distinct() and emit a (null, null) label row
    # (ADVICE r12, low)
    ok_edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(3,), (None,)], "node long")
    with pytest.raises(SparkRuntimeException, match="null row in nodes"):
        connected_components(ok_edges, nodes=nodes).collect()
