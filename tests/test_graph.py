"""Connected-components operator (E19f) — cluster assignment semantics."""

from __future__ import annotations

from pyspark.sql import Row

from s4hanaconnector_spark.operators.graph import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs], "src bigint, dst bigint"
    )


def test_two_components_and_chain(spark):
    """A long path (stress for propagation depth), a triangle, and the
    direction-insensitivity of the edge list."""
    path = [(i, i + 1) for i in range(1, 8)]  # 1-2-...-8
    tri = [(20, 21), (22, 21), (20, 22)]  # reversed direction mixed in
    out = {
        r["id"]: r["component"]
        for r in connected_components(_edges(spark, path + tri)).collect()
    }
    assert all(out[i] == 1 for i in range(1, 9))
    assert all(out[i] == 20 for i in (20, 21, 22))


def test_singleton_nodes(spark):
    """Nodes with no edges keep themselves as component when the node
    universe is supplied (docs with no duplicates)."""
    nodes = _edges(spark, [(5, 5)]).sparkSession.createDataFrame(
        [Row(id=i) for i in [1, 2, 3, 9]], "id bigint"
    )
    out = {
        r["id"]: r["component"]
        for r in connected_components(
            _edges(spark, [(1, 2)]), nodes=nodes, id_col="id"
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 3, 9: 9}


def test_self_loops_ignored(spark):
    out = connected_components(_edges(spark, [(4, 4)])).collect()
    assert out == []  # a pure self-loop contributes no node


def test_converges_under_tight_iteration_budget(spark):
    """Pointer jumping gives O(log d) rounds: a 16-node path must converge
    within 6 iterations (would need 15 with plain neighbor propagation)."""
    path = [(i, i + 1) for i in range(1, 16)]
    out = {
        r["id"]: r["component"]
        for r in connected_components(_edges(spark, path), max_iter=6).collect()
    }
    assert set(out.values()) == {1}


class TestPageRank:
    def test_ranks_sum_to_one_and_favor_hubs(self, spark):
        from s4hanaconnector_spark.operators.graph import pagerank

        # star: everything links to 'hub' (and back, so nothing dangles)
        edges = [("a", "hub"), ("b", "hub"), ("c", "hub"),
                 ("hub", "a"), ("hub", "b"), ("hub", "c")]
        df = spark.createDataFrame(edges, "src string, dst string")
        ranks = {r["id"]: r["r"] for r in pagerank(df, iterations=10).collect()}
        assert abs(sum(ranks.values()) - 1.0) < 1e-6  # stochastic vector
        assert all(ranks["hub"] > ranks[x] for x in "abc")
        a, b, c = ranks["a"], ranks["b"], ranks["c"]
        assert abs(a - b) < 1e-12 and abs(b - c) < 1e-12  # symmetry

    def test_dangling_node_gets_teleport_only(self, spark):
        from s4hanaconnector_spark.operators.graph import pagerank

        # 'sink' has no in-edges after one hop chain: x -> sink means sink HAS
        # an in-edge; make 'lonely' only ever a source
        df = spark.createDataFrame(
            [("lonely", "p"), ("p", "q"), ("q", "p")], "src string, dst string"
        )
        ranks = {r["id"]: r["r"] for r in pagerank(df, iterations=5, damping=0.85).collect()}
        assert abs(ranks["lonely"] - 0.15 / 3) < 1e-12  # teleport term only


def test_explicit_node_universe_excludes_stale_edges(spark):
    """An edge referencing a node OUTSIDE the caller's universe (a doc
    filtered out upstream while the candidate-pair table is stale) must
    neither resurrect the phantom node in the output nor leak its id as a
    component label."""
    from pyspark.sql import functions as F

    from s4hanaconnector_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    edges = spark.createDataFrame([(1, 5), (5, 6), (7, 8)], "src bigint, dst bigint")
    nodes = spark.createDataFrame([(5,), (6,), (7,)], "id bigint")
    cc = {r["id"]: r["component"] for r in connected_components(edges, nodes=nodes).collect()}
    # phantom nodes 1 and 8 absent; 5-6 cluster labeled by min IN-universe id
    assert cc == {5: 5, 6: 5, 7: 7}
    lp = {r["id"]: r["label"] for r in label_propagation(edges, nodes=nodes).collect()}
    assert lp == {5: 5, 6: 5, 7: 7}
