"""End-to-end HierNMF2 oracle parity (VERDICT r2 missing #1).

tests/np_hierclust.py is an independent plain-numpy f64 transcription of
the reference tree engine (ClustHier/TrialSplit/ActualSplit + the rank-2
solver + PG_RATIO loop, clust_hier_generic.hpp:77-517).  Both engines
consume the SAME initdir fixtures (the reference's determinism hook), so
tree structure, per-node doc sets, priorities, and assignments must
match exactly — the L4 analogue of the L2 trajectory oracles in
test_oracles.py.

The fixtures are sparse-style (exact zeros), so the reference's
SubMatrixColsCompact row compaction is exercised for real: deep nodes
have zero rows, and the engine's zeroed-W0 equivalence must reproduce
the compacted trajectories bit-for-bit (up to f64 reduction order).
"""

import numpy as np
import pytest

from smallk_tpu.common.options import (
    ClustOptions,
    NmfAlgorithm,
    NmfOptions,
    NmfProgressAlgorithm,
)
from smallk_tpu.common.rng import Random
from smallk_tpu.engines.hierclust import clust_hier

from np_hierclust import (
    NpClustOptions,
    NpNmfOptions,
    np_clust_hier,
)


def _planted_sparse(m, n, sizes, seed=0, density=0.25):
    """Block-structured nonneg matrix with exact zeros outside blocks
    (so node subsets have empty rows -> row compaction is exercised)."""
    rng = np.random.RandomState(seed)
    k = len(sizes)
    A = np.zeros((m, n))
    terms_per = m // k
    col = 0
    labels = np.zeros(n, dtype=int)
    for c, sz in enumerate(sizes):
        rows = slice(c * terms_per, (c + 1) * terms_per)
        block = rng.rand(terms_per, sz) * (
            rng.rand(terms_per, sz) < density
        )
        block[0, :] += 0.5  # no all-zero columns
        A[rows, col:col + sz] = block
        labels[col:col + sz] = c
        col += sz
    # light overlap so off-block rows are not ALL zero for wide subsets
    overlap = (rng.rand(m, n) < 0.02) * rng.rand(m, n) * 0.1
    return A + overlap, labels


def _write_initdir(tmp_path, m, n, count, seed=123):
    rng = np.random.RandomState(seed)
    for i in range(1, count + 1):
        W = rng.rand(m, 2)
        H = rng.rand(2, n)
        np.savetxt(tmp_path / f"Winit_{i}.csv", W, delimiter=",",
                   fmt="%.17g")
        np.savetxt(tmp_path / f"Hinit_{i}.csv", H, delimiter=",",
                   fmt="%.17g")
    return str(tmp_path)


def _clust_opts(k, initdir, unbalanced=0.1, trial_allowance=3,
                verbose=False):
    return ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4, algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
            min_iter=1, max_iter=5000, verbose=False, dtype="float64",
        ),
        num_clusters=k, verbose=verbose, initdir=initdir,
        unbalanced=unbalanced, trial_allowance=trial_allowance,
    )


def _np_opts(k, unbalanced=0.1, trial_allowance=3):
    return NpClustOptions(
        num_clusters=k, unbalanced=unbalanced,
        trial_allowance=trial_allowance,
        nmf=NpNmfOptions(tol=1e-4, min_iter=1, max_iter=5000, tolcount=1),
    )


def _assert_trees_match(tree, nptree):
    n_nodes = len(tree.nodes)
    assert n_nodes == nptree.node_count
    for q in range(n_nodes):
        e, o = tree.nodes[q], nptree.nodes[q]
        assert e.is_valid == o.is_valid, f"node {q} validity"
        if not e.is_valid:
            continue
        assert tree.is_leaf[q] == nptree.is_leaf[q], f"node {q} leafness"
        assert e.parent_index == o.parent, f"node {q} parent"
        assert e.left_child_index == o.left_child, f"node {q} lchild"
        np.testing.assert_array_equal(
            np.sort(np.asarray(e.docs)), np.sort(o.docs),
            err_msg=f"node {q} docs",
        )
        if tree.is_leaf[q]:
            assert e.priority == pytest.approx(o.priority, rel=1e-7,
                                               abs=1e-9), f"node {q}"
    np.testing.assert_array_equal(tree.assignments, nptree.assignments())


class TestHierOracleParity:
    def test_tree_matches_numpy_oracle(self, tmp_path):
        """Full-engine parity on a 4-cluster planted matrix."""
        m, n, k = 48, 72, 4
        A, _ = _planted_sparse(m, n, [24, 18, 16, 14], seed=3)
        initdir = _write_initdir(tmp_path, m, n, 60, seed=11)

        tree, stats = clust_hier(A, _clust_opts(k, initdir), Random(1))
        nptree, events = np_clust_hier(A, _np_opts(k), initdir)

        _assert_trees_match(tree, nptree)
        assert stats.nmf_count == events["nmf_count"]
        # per-solve iteration counts are trajectory-sensitive: they pin
        # the engine's PG_RATIO loop AND the compacted-W0 initializer
        # semantics against the oracle (a full-height W0 changes W'W on
        # the first step and shifts convergence iterations)
        assert stats.iter_count == events["iter_count"]

    def test_drop_and_recycle_branches(self, tmp_path, capsys):
        """TrialSplit outlier drop AND recycle execute and stay in
        lockstep with the oracle (clust_hier_generic.hpp:296-373).

        A tiny planted cluster forces an unbalanced split whose small
        side scores below min_priority: with trial_allowance=2 the first
        round DROPS the small subset and retries; a node that stays
        unbalanced through both rounds RECYCLES into a priority -2
        permanent leaf."""
        m, n = 40, 64
        A, _ = _planted_sparse(m, n, [30, 28, 6], seed=5)
        initdir = _write_initdir(tmp_path, m, n, 80, seed=17)

        opts = _clust_opts(3, initdir, unbalanced=0.45,
                           trial_allowance=2, verbose=True)
        tree, stats = clust_hier(A, opts, Random(1))
        out = capsys.readouterr().out
        nptree, events = np_clust_hier(
            A, _np_opts(3, unbalanced=0.45, trial_allowance=2), initdir
        )

        # the branches must have actually run (else this test is vacuous)
        assert len(events["drops"]) > 0, "fixture never dropped outliers"
        assert len(events["recycles"]) > 0, "fixture never recycled"
        # engine printed the same number of drop/recycle events
        assert out.count("dropping") == len(events["drops"])
        assert out.count("recycling") == len(events["recycles"])

        _assert_trees_match(tree, nptree)
        assert stats.nmf_count == events["nmf_count"]
        assert stats.iter_count == events["iter_count"]
