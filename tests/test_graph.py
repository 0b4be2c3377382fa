"""Graph community-detection workflow tests (engines/graph.py) and the
round-3 quality levers: size-aware pop priority + best-of-R restarts.

The planted-partition recovery targets mirror bench.py's NMI metric
(VERDICT r2: median >= 0.85 / worst >= 0.6 across seeds on the 3000-node
graph; here a smaller graph keeps CPU CI fast)."""

import numpy as np
import scipy.sparse as sp

from smallk_tpu.common.options import ClustOptions
from smallk_tpu.common.rng import Random
from smallk_tpu.engines.corpus import planted_partition_graph
from smallk_tpu.engines.graph import (
    graph_clust_options,
    normalized_adjacency,
)
from smallk_tpu.engines.hierclust import clust_hier
from smallk_tpu.engines.scoring import score_clustering
from smallk_tpu.engines.tree import Tree


class TestNormalizedAdjacency:
    def test_symmetric_normalization(self):
        A = sp.csc_matrix(np.array([
            [0, 1, 1, 0],
            [1, 0, 1, 0],
            [1, 1, 0, 0],
            [0, 0, 0, 0],  # isolated vertex
        ], dtype=np.float64))
        N = normalized_adjacency(A, kind="sym")
        deg = np.array([2.0, 2.0, 2.0, 1.0])  # zero-degree clamped to 1
        expect = A.toarray() / np.sqrt(np.outer(deg, deg))
        np.testing.assert_allclose(N.toarray(), expect, atol=1e-12)
        # symmetric in, symmetric out
        np.testing.assert_allclose(N.toarray(), N.toarray().T)

    def test_random_walk_normalization(self):
        A = sp.csc_matrix(np.array([[0, 2.0], [1.0, 0]]))
        N = normalized_adjacency(A, kind="rw")
        np.testing.assert_allclose(
            N.toarray(), np.array([[0, 1.0], [1.0, 0]])
        )

    def test_dense_input_and_bad_kind(self):
        import pytest

        N = normalized_adjacency(np.eye(3))
        assert sp.issparse(N)
        with pytest.raises(ValueError):
            normalized_adjacency(np.eye(3), kind="bogus")


class TestGraphClustOptions:
    def test_preset_fields(self):
        opts = graph_clust_options(8)
        assert isinstance(opts, ClustOptions)
        assert opts.num_clusters == 8
        assert opts.priority_method == "size_ndcg"
        assert opts.restarts == 3
        opts.validate()

    def test_overrides(self):
        opts = graph_clust_options(4, restarts=1, maxterms=7)
        assert opts.restarts == 1
        assert opts.maxterms == 7

    def test_validation_rejects_bad_values(self):
        import dataclasses

        import pytest

        with pytest.raises(ValueError):
            dataclasses.replace(
                graph_clust_options(4), priority_method="bogus"
            ).validate()
        with pytest.raises(ValueError):
            dataclasses.replace(graph_clust_options(4),
                                restarts=0).validate()


def _small_graph(seed=7):
    return planted_partition_graph(
        600, 4, intra_edges_per_node=20, inter_edges_per_node=2, seed=seed
    )


class TestSizeNdcgPriority:
    def test_pop_priority_scaling(self):
        G, _ = _small_graph()
        Gn = normalized_adjacency(G)
        opts = graph_clust_options(4, restarts=1)
        tree, _ = clust_hier(Gn, opts, Random(5))
        checked = 0
        for q, leaf in enumerate(tree.is_leaf):
            node = tree.nodes[q]
            if not node.is_valid:
                continue
            if node.priority > 0:
                assert node.pop_priority == node.priority * len(node.docs)
                checked += 1
            else:
                assert node.pop_priority == node.priority
        assert checked > 0

    def test_default_ndcg_pop_equals_priority(self):
        G, _ = _small_graph()
        opts = graph_clust_options(4, restarts=1,
                                   priority_method="ndcg")
        tree, _ = clust_hier(normalized_adjacency(G), opts, Random(5))
        for node in tree.nodes:
            if node.is_valid:
                assert node.pop_priority == node.priority

    def test_pop_priority_serialization_roundtrip(self):
        G, _ = _small_graph()
        opts = graph_clust_options(4, restarts=1)
        tree, _ = clust_hier(normalized_adjacency(G), opts, Random(5))
        arrs = tree.to_arrays()
        t2 = Tree.from_arrays(arrs)
        for a, b in zip(tree.nodes, t2.nodes):
            assert a.pop_priority == b.pop_priority
        # legacy checkpoints have no pop_priority: falls back to priority
        del arrs["pop_priority"]
        t3 = Tree.from_arrays(arrs)
        for a, b in zip(tree.nodes, t3.nodes):
            assert b.pop_priority == a.priority


class TestBestOfRestarts:
    def test_determinism(self):
        G, _ = _small_graph()
        Gn = normalized_adjacency(G)
        opts = graph_clust_options(4)  # restarts=3
        t1, _ = clust_hier(Gn, opts, Random(11))
        t2, _ = clust_hier(Gn, opts, Random(11))
        np.testing.assert_array_equal(t1.assignments, t2.assignments)

    def test_community_recovery_quality(self):
        """End-to-end graph preset recovers the planted partition —
        the small-scale version of bench.py's north-star metric."""
        G, labels = _small_graph()
        Gn = normalized_adjacency(G)
        opts = graph_clust_options(4)
        nmis = []
        for seed in (3, 4, 5):
            tree, _ = clust_hier(Gn, opts, Random(seed))
            nmis.append(
                score_clustering(tree.assignments, labels)["nmi"]
            )
        assert np.median(nmis) >= 0.8, nmis
        assert min(nmis) >= 0.5, nmis

    def test_restarts_on_text_matrix(self):
        """restarts>1 works on the dense text path too (gather buckets +
        pair batching) and stays deterministic."""
        rng = np.random.RandomState(0)
        A = rng.rand(40, 60) + np.repeat(np.eye(3), (14, 13, 13),
                                         axis=0)[:, rng.randint(0, 3, 60)]
        import dataclasses

        opts = dataclasses.replace(graph_clust_options(3), restarts=2)
        t1, _ = clust_hier(A, opts, Random(2))
        t2, _ = clust_hier(A, opts, Random(2))
        np.testing.assert_array_equal(t1.assignments, t2.assignments)
        assert sorted(set(t1.assignments[t1.assignments >= 0])) != []
