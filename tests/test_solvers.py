"""Solver correctness tests.

Modeled on the reference test strategy (SURVEY.md §4): randomized
property tests with numerical tolerances replacing byte-exact goldens —
NNLS-BPP vs scipy's active-set NNLS (reference TestBpp used Matlab goldens),
rank-2 Givens solve vs direct solve (reference TestRank2SystemSolve),
and reconstruction-error descent for each full NMF algorithm
(reference TestDenseNmf ComparisonTest).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from smallk_tpu.common.options import (
    NmfAlgorithm,
    NmfOptions,
    NmfProgressAlgorithm,
)
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.ops.aop import DenseAOp
from smallk_tpu.ops.dense import relative_fnorm
from smallk_tpu.solvers.nnls import nnls_blockpivot
from smallk_tpu.solvers.rank2 import _system_solve_h, _system_solve_w
from smallk_tpu.solvers.solve import nmf_solve

DTYPE = jnp.float64


def _spd(k, seed):
    rng = np.random.RandomState(seed)
    W = rng.rand(4 * k, k)
    return W.T @ W + 1e-8 * np.eye(k)


class TestNnlsBlockpivot:
    """vs scipy.optimize.nnls per column (reference TestBpp model)."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("k,n", [(4, 12), (8, 33), (16, 50)])
    def test_matches_scipy(self, seed, k, n):
        from scipy.optimize import nnls as scipy_nnls

        rng = np.random.RandomState(seed)
        Wf = rng.rand(3 * k, k)
        LHS = Wf.T @ Wf + 1e-6 * np.eye(k)
        RHS = Wf.T @ rng.rand(3 * k, n)
        Xinit = rng.rand(k, n) - 0.3  # mixed-sign warm start

        X, Y, ok, _ = nnls_blockpivot(
            jnp.asarray(LHS, DTYPE), jnp.asarray(RHS, DTYPE),
            jnp.asarray(Xinit, DTYPE),
        )
        assert bool(ok)
        X = np.asarray(X)

        # scipy nnls solves min ||Cx - d||; our problem is the normal
        # equation LHS x = rhs with LHS = C'C, rhs = C'd
        L = np.linalg.cholesky(LHS)
        for j in range(n):
            d = np.linalg.solve(L, RHS[:, j])
            x_ref, _ = scipy_nnls(L.T, d)
            np.testing.assert_allclose(X[:, j], x_ref, atol=1e-6)

        # KKT: Y = LHS X - RHS; X>=0, Y>=-tol on active, |X*Y| small
        Y = np.asarray(Y)
        assert (X >= 0).all()
        assert (Y >= -1e-8).all() or np.allclose(X[Y < -1e-8], 0, atol=1e-8)
        assert np.abs(X * Y).max() < 1e-6

    def test_warm_start_all_positive(self):
        # passive set = everything: single unconstrained solve suffices
        k, n = 6, 10
        rng = np.random.RandomState(11)
        LHS = _spd(k, 11)
        Xtrue = rng.rand(k, n) + 0.1
        RHS = LHS @ Xtrue
        X, Y, ok, _ = nnls_blockpivot(
            jnp.asarray(LHS, DTYPE), jnp.asarray(RHS, DTYPE),
            jnp.asarray(Xtrue, DTYPE),
        )
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(X), Xtrue, atol=1e-8)


class TestRank2SystemSolve:
    """Givens 2x2 solver vs direct solve (reference TestRank2SystemSolve)."""

    @pytest.mark.parametrize("seed", range(8))
    def test_solve_h(self, seed):
        rng = np.random.RandomState(seed)
        Wf = rng.rand(10, 2)
        A = Wf.T @ Wf
        B = rng.rand(2, 7)
        X, ok = _system_solve_h(jnp.asarray(A, DTYPE), jnp.asarray(B, DTYPE))
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, B),
                                   atol=1e-10)

    @pytest.mark.parametrize("seed", range(8))
    def test_solve_w(self, seed):
        rng = np.random.RandomState(seed)
        Hf = rng.rand(2, 10)
        A = Hf @ Hf.T
        B = rng.rand(7, 2)
        X, ok = _system_solve_w(jnp.asarray(A, DTYPE), jnp.asarray(B, DTYPE))
        assert bool(ok)
        # solve X A = B  =>  X = B A^{-1}
        np.testing.assert_allclose(
            np.asarray(X), B @ np.linalg.inv(A), atol=1e-10
        )

    def test_singular_detected(self):
        A = jnp.zeros((2, 2), DTYPE)
        B = jnp.ones((2, 3), DTYPE)
        _, ok = _system_solve_h(A, B)
        assert not bool(ok)


def _run_nmf(alg, m=48, n=40, k=5, seed=0, tol=1e-4, max_iter=500,
             prog=NmfProgressAlgorithm.PG_RATIO):
    rng = Random(seed)
    A = random_matrix(m, n, rng, dtype=np.float64)
    k_eff = 2 if alg == NmfAlgorithm.RANK2 else k
    W0 = random_matrix(m, k_eff, rng, dtype=np.float64)
    H0 = random_matrix(k_eff, n, rng, dtype=np.float64)
    opts = NmfOptions(
        tol=tol, algorithm=alg, prog_est_algorithm=prog,
        height=m, width=n, k=k_eff, min_iter=5, max_iter=max_iter,
        verbose=False, dtype="float64",
    )
    a_op = DenseAOp(jnp.asarray(A, DTYPE))
    res = nmf_solve(a_op, jnp.asarray(W0, DTYPE), jnp.asarray(H0, DTYPE), opts)
    return A, res


class TestNmfAlgorithms:
    @pytest.mark.parametrize(
        "alg",
        [NmfAlgorithm.MU, NmfAlgorithm.HALS, NmfAlgorithm.BPP,
         NmfAlgorithm.RANK2],
    )
    def test_descends_and_nonneg(self, alg):
        A, res = _run_nmf(alg)
        assert bool(res.success)
        W, H = np.asarray(res.W), np.asarray(res.H)
        assert (W >= 0).all() and (H >= 0).all()
        rel = float(relative_fnorm(jnp.asarray(A, DTYPE), res.W, res.H))
        # random uniform matrices factor to modest residual; mostly we check
        # the solve actually reduced error vs the trivial zero factorization
        assert rel < 0.55
        assert int(res.iterations) >= 5

    @pytest.mark.parametrize(
        "alg", [NmfAlgorithm.HALS, NmfAlgorithm.BPP]
    )
    def test_exact_lowrank_recovery(self, alg):
        # A = W* H* with k matching: solvers should reach tiny residual
        rng = np.random.RandomState(3)
        m, n, k = 40, 36, 4
        Wt, Ht = rng.rand(m, k), rng.rand(k, n)
        A = Wt @ Ht
        W0 = rng.rand(m, k)
        H0 = rng.rand(k, n)
        opts = NmfOptions(
            tol=1e-6, algorithm=alg, height=m, width=n, k=k,
            min_iter=5, max_iter=2000, verbose=False, dtype="float64",
        )
        res = nmf_solve(
            DenseAOp(jnp.asarray(A, DTYPE)), jnp.asarray(W0, DTYPE),
            jnp.asarray(H0, DTYPE), opts,
        )
        rel = float(relative_fnorm(jnp.asarray(A, DTYPE), res.W, res.H))
        assert rel < 1e-3

    def test_mu_with_delta_fnorm(self):
        # the facade forces MU to DELTA_FNORM stopping (smallk.cpp:574-582)
        A, res = _run_nmf(
            NmfAlgorithm.MU, prog=NmfProgressAlgorithm.DELTA_FNORM,
            tol=1e-3, max_iter=300,
        )
        assert bool(res.success)

    def test_normalized_output(self):
        _, res = _run_nmf(NmfAlgorithm.BPP)
        W = np.asarray(res.W)
        norms = np.linalg.norm(W, axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=1e-10)

    def test_max_iter_counts_as_success(self):
        _, res = _run_nmf(NmfAlgorithm.MU, tol=1e-12, max_iter=8)
        assert int(res.iterations) == 8
        assert bool(res.success)
        assert not bool(res.converged)

    def test_determinism(self):
        _, r1 = _run_nmf(NmfAlgorithm.BPP, seed=42)
        _, r2 = _run_nmf(NmfAlgorithm.BPP, seed=42)
        np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r2.W))
        assert int(r1.iterations) == int(r2.iterations)


class TestOptionsValidation:
    def test_bad_k(self):
        with pytest.raises(ValueError):
            NmfOptions(height=10, width=10, k=11).validate()

    def test_rank2_requires_k2(self):
        with pytest.raises(ValueError):
            NmfOptions(
                height=10, width=10, k=3, algorithm=NmfAlgorithm.RANK2
            ).validate()

    def test_ok(self):
        NmfOptions(height=10, width=10, k=4).validate()


class TestCheckInterval:
    def test_interval_skips_checks(self):
        # with a large check interval, convergence is only declared at
        # check iterations; results at interval=1 and interval=3 agree on
        # the final factors for a fixed iteration budget
        import dataclasses

        A, res1 = _run_nmf(NmfAlgorithm.MU, tol=1e-12, max_iter=30)
        rng = Random(0)
        m, n, k = 48, 40, 5
        A = random_matrix(m, n, rng, dtype=np.float64)
        W0 = random_matrix(m, k, rng, dtype=np.float64)
        H0 = random_matrix(k, n, rng, dtype=np.float64)
        base = NmfOptions(
            tol=1e-12, algorithm=NmfAlgorithm.MU,
            prog_est_algorithm=NmfProgressAlgorithm.DELTA_FNORM,
            height=m, width=n, k=k, min_iter=2, max_iter=30,
            verbose=False, dtype="float64",
        )
        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        r1 = nmf_solve(a_op, jnp.asarray(W0, DTYPE), jnp.asarray(H0, DTYPE),
                       base)
        r3 = nmf_solve(a_op, jnp.asarray(W0, DTYPE), jnp.asarray(H0, DTYPE),
                       dataclasses.replace(base, check_interval=3))
        # neither converges at tol=1e-12; identical trajectories
        np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r3.W))

    def test_interval_convergence_still_detected(self):
        import dataclasses

        rng = Random(3)
        m, n, k = 40, 36, 4
        Wt, Ht = (np.abs(random_matrix(m, k, rng)),
                  np.abs(random_matrix(k, n, rng)))
        A = Wt @ Ht
        W0 = random_matrix(m, k, rng)
        H0 = random_matrix(k, n, rng)
        opts = NmfOptions(
            tol=1e-5, algorithm=NmfAlgorithm.HALS, height=m, width=n, k=k,
            min_iter=5, max_iter=2000, verbose=False, dtype="float64",
            check_interval=5,
        )
        res = nmf_solve(DenseAOp(jnp.asarray(A, DTYPE)),
                        jnp.asarray(W0, DTYPE), jnp.asarray(H0, DTYPE), opts)
        assert bool(res.converged)
        # convergence declared only on a check iteration
        assert (int(res.iterations) - 1 - opts.min_iter) % 5 == 0


class TestStallPatience:
    def test_stall_stops_early(self):
        import dataclasses

        rng = Random(9)
        m, n, k = 48, 40, 4
        A = random_matrix(m, n, rng, dtype=np.float64)
        W0 = random_matrix(m, k, rng, dtype=np.float64)
        H0 = random_matrix(k, n, rng, dtype=np.float64)
        base = NmfOptions(
            tol=1e-30, algorithm=NmfAlgorithm.HALS,  # unreachable tol
            height=m, width=n, k=k, min_iter=5, max_iter=3000,
            verbose=False, dtype="float64",
        )
        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        full = nmf_solve(a_op, jnp.asarray(W0, DTYPE), jnp.asarray(H0, DTYPE),
                         base)
        stalled = nmf_solve(
            a_op, jnp.asarray(W0, DTYPE), jnp.asarray(H0, DTYPE),
            dataclasses.replace(base, stall_patience=20),
        )
        assert int(full.iterations) == 3000
        assert int(stalled.iterations) < 3000
        assert bool(stalled.success)


class TestVmapSolve:
    def test_batched_matches_individual(self):
        """vmap over stacked problems must equal individual solves — the
        done-gating freezes early-converging batch elements."""
        import jax

        rng = Random(21)
        m, n, k = 32, 24, 3
        problems = []
        for i in range(3):
            A = np.abs(random_matrix(m, n, Random(100 + i)))
            W0 = random_matrix(m, k, Random(200 + i))
            H0 = random_matrix(k, n, Random(300 + i))
            problems.append((A, W0, H0))
        opts = NmfOptions(
            tol=1e-3, algorithm=NmfAlgorithm.HALS, height=m, width=n, k=k,
            min_iter=3, max_iter=400, verbose=False, dtype="float64",
        )

        singles = [
            nmf_solve(DenseAOp(jnp.asarray(A, DTYPE)),
                      jnp.asarray(W0, DTYPE), jnp.asarray(H0, DTYPE), opts)
            for A, W0, H0 in problems
        ]
        iters = [int(r.iterations) for r in singles]
        assert len(set(iters)) > 1, "want differing convergence speeds"

        As = jnp.stack([jnp.asarray(p[0], DTYPE) for p in problems])
        W0s = jnp.stack([jnp.asarray(p[1], DTYPE) for p in problems])
        H0s = jnp.stack([jnp.asarray(p[2], DTYPE) for p in problems])
        batched = jax.vmap(
            lambda A, W0, H0: nmf_solve(DenseAOp(A), W0, H0, opts)
        )(As, W0s, H0s)

        for i, r in enumerate(singles):
            assert int(batched.iterations[i]) == int(r.iterations)
            np.testing.assert_allclose(
                np.asarray(batched.W[i]), np.asarray(r.W),
                rtol=1e-12, atol=1e-14,
            )


class TestPrecisionParity:
    """f32 solves must reach the same reconstruction quality as f64
    (north-star: 'match relative reconstruction error within run-to-run
    variance')."""

    @pytest.mark.parametrize(
        "alg", [NmfAlgorithm.MU, NmfAlgorithm.HALS, NmfAlgorithm.BPP]
    )
    def test_f32_matches_f64_quality(self, alg):
        rng = Random(31)
        m, n, k = 60, 50, 6
        A = np.abs(random_matrix(m, n, rng))
        W0 = random_matrix(m, k, rng)
        H0 = random_matrix(k, n, rng)
        rels = {}
        for dt in ("float64", "float32"):
            dd = jnp.dtype(dt)
            opts = NmfOptions(
                tol=1e-4, algorithm=alg, height=m, width=n, k=k,
                min_iter=5, max_iter=1000, verbose=False, dtype=dt,
            )
            res = nmf_solve(
                DenseAOp(jnp.asarray(A, dd)), jnp.asarray(W0, dd),
                jnp.asarray(H0, dd), opts,
            )
            assert bool(res.success)
            W = np.asarray(res.W, np.float64)
            H = np.asarray(res.H, np.float64)
            rels[dt] = np.linalg.norm(A - W @ H) / np.linalg.norm(A)
        assert abs(rels["float32"] - rels["float64"]) < 2e-3, rels


class TestHighRankNnls:
    def test_k128_matches_gj_and_converges(self):
        """The k>64 Cholesky masked-solve path agrees with the GJ path and
        the full NNLS still satisfies KKT."""
        import smallk_tpu.solvers.nnls as nn

        k, n = 96, 300
        rng = np.random.RandomState(0)
        Wf = rng.rand(3 * k, k)
        LHS = jnp.asarray(Wf.T @ Wf + 1e-6 * np.eye(k), DTYPE)
        RHS = jnp.asarray(Wf.T @ rng.rand(3 * k, n), DTYPE)
        passive = jnp.asarray(rng.rand(k, n) > 0.4)

        x_gj = nn._gj_solve_block(LHS, RHS, passive)
        x_ch = nn._chol_solve_block(LHS, RHS, passive)
        np.testing.assert_allclose(np.asarray(x_ch), np.asarray(x_gj),
                                   rtol=1e-8, atol=1e-9)

        X, Y, ok, _ = nn.nnls_blockpivot(
            LHS, RHS, jnp.asarray(rng.rand(k, n) - 0.3, DTYPE)
        )
        assert bool(ok)
        X, Y = np.asarray(X), np.asarray(Y)
        assert (X >= 0).all()
        assert np.abs(X * Y).max() < 1e-5

    def test_dead_topic_guarded_in_chol_path(self):
        import smallk_tpu.solvers.nnls as nn

        k, n = 80, 64
        rng = np.random.RandomState(1)
        Wf = rng.rand(3 * k, k)
        Wf[:, 5] = 0.0  # dead topic
        LHS = jnp.asarray(Wf.T @ Wf + 0.0, DTYPE)
        RHS = jnp.asarray(Wf.T @ rng.rand(3 * k, n), DTYPE)
        passive = jnp.ones((k, n), dtype=bool)
        x = nn._chol_solve_block(LHS, RHS, passive)
        assert not np.isnan(np.asarray(x)).any()
        np.testing.assert_allclose(np.asarray(x)[5], 0.0, atol=1e-12)


class TestCompactPassiveSolve:
    """The compact-passive masked solve (solvers/nnls._compact_solve_block)
    must agree exactly with the full masked GJ for every passive
    configuration: compact tier, overflow tier, and full escalation."""

    @pytest.mark.parametrize("k,n,pmax", [
        (64, 300, 20),     # all columns in the compact tier
        (128, 500, 50),    # compact tier at k > GJ crossover
        (96, 257, 96),     # overflow tier engaged (some s_j > S)
        (128, 400, 128),   # escalation: overflow wider than the tier
    ])
    def test_matches_full_masked_solve(self, k, n, pmax):
        import smallk_tpu.solvers.nnls as nn

        rng = np.random.RandomState(k + n)
        B = rng.rand(k, 2 * k)
        LHS = jnp.asarray(B @ B.T + 0.1 * np.eye(k), DTYPE)
        RHS = jnp.asarray(rng.randn(k, n), DTYPE)
        sizes = rng.randint(0, pmax + 1, n)
        passive = np.zeros((k, n), bool)
        for j in range(n):
            passive[rng.choice(k, sizes[j], replace=False), j] = True

        Xc = np.asarray(nn._compact_solve_block(LHS, RHS, jnp.asarray(passive)))
        Xf = np.asarray(nn._gj_solve_block(LHS, RHS, jnp.asarray(passive)))
        np.testing.assert_allclose(Xc, Xf, rtol=1e-9, atol=1e-10)

    def test_bpp_high_rank_converges_through_compact_path(self):
        """End-to-end NMF-BPP at a rank using the compact dispatch."""
        import smallk_tpu.solvers.nnls as nn

        k = max(48, nn._COMPACT_MIN_K)
        m, n = 160, 120
        rng = Random(5)
        Wt = np.asarray(random_matrix(m, k, rng)) ** 3  # sparse-ish optimum
        Ht = np.asarray(random_matrix(k, n, rng)) ** 3
        A = jnp.asarray(Wt @ Ht, DTYPE)
        opts = NmfOptions(tol=1e-5, algorithm=NmfAlgorithm.BPP, height=m,
                          width=n, k=k, min_iter=1, max_iter=300,
                          verbose=False, dtype="float64")
        res = nmf_solve(DenseAOp(A),
                        jnp.asarray(random_matrix(m, k, rng), DTYPE),
                        jnp.asarray(random_matrix(k, n, rng), DTYPE), opts)
        assert bool(res.success)
        assert float(relative_fnorm(A, res.W, res.H)) < 0.05


class TestMaskedCgSolve:
    """The masked conjugate-gradient solve (solvers/nnls._cg_solve_block,
    the huge-width high-rank tier) must agree with the direct masked GJ
    to residual level, guard dead topics, and carry a full NNLS/BPP run
    when forced via MASKED_SOLVER="cg"."""

    @staticmethod
    def _problem(k, n, pdens, seed, dtype=DTYPE):
        rng = np.random.RandomState(seed)
        B = rng.rand(k, 2 * k)
        LHS = jnp.asarray(B @ B.T + 0.1 * np.eye(k), dtype)
        RHS = jnp.asarray(rng.randn(k, n), dtype)
        passive = jnp.asarray(rng.rand(k, n) < pdens)
        return LHS, RHS, passive

    @pytest.mark.parametrize("k,n,pdens", [
        (8, 300, 0.5),     # low rank
        (64, 400, 0.25),   # the measured BPP passive density (~30/128)
        (128, 257, 0.9),   # nearly full passive sets
    ])
    def test_matches_direct_solve(self, k, n, pdens):
        import smallk_tpu.solvers.nnls as nn

        LHS, RHS, passive = self._problem(k, n, pdens, seed=k + n)
        Xc = np.asarray(nn._cg_solve_block(LHS, RHS, passive))
        Xd = np.asarray(nn._gj_solve_block(LHS, RHS, passive))
        scale = np.abs(Xd).max()
        np.testing.assert_allclose(Xc, Xd, rtol=0, atol=1e-9 * scale)
        # non-passive rows exactly zero (same contract as GJ/Cholesky)
        assert (Xc[~np.asarray(passive)] == 0).all()

    def test_f32_residual_level(self):
        import smallk_tpu.solvers.nnls as nn

        LHS, RHS, passive = self._problem(96, 300, 0.3, seed=2,
                                          dtype=jnp.float32)
        Xc = np.asarray(nn._cg_solve_block(LHS, RHS, passive))
        Xd = np.asarray(nn._gj_solve_block(LHS, RHS, passive))
        scale = np.abs(Xd).max()
        np.testing.assert_allclose(Xc, Xd, rtol=0, atol=3e-4 * scale)

    def test_dead_topic_guarded(self):
        import smallk_tpu.solvers.nnls as nn

        k, n = 80, 64
        rng = np.random.RandomState(1)
        Wf = rng.rand(3 * k, k)
        Wf[:, 5] = 0.0  # dead topic: zero Gram row/col
        LHS = jnp.asarray(Wf.T @ Wf, DTYPE)
        RHS = jnp.asarray(Wf.T @ rng.rand(3 * k, n), DTYPE)
        x = np.asarray(nn._cg_solve_block(
            LHS, RHS, jnp.ones((k, n), dtype=bool)
        ))
        assert not np.isnan(x).any()
        np.testing.assert_allclose(x[5], 0.0, atol=1e-12)

    def test_bpp_converges_through_cg_path(self):
        import smallk_tpu.solvers.nnls as nn

        k, m, n = 48, 160, 120
        rng = Random(5)
        Wt = np.asarray(random_matrix(m, k, rng)) ** 3
        Ht = np.asarray(random_matrix(k, n, rng)) ** 3
        A = jnp.asarray(Wt @ Ht, DTYPE)
        opts = NmfOptions(tol=1e-5, algorithm=NmfAlgorithm.BPP, height=m,
                          width=n, k=k, min_iter=1, max_iter=300,
                          verbose=False, dtype="float64")
        nn.set_masked_solver("cg")
        try:
            res = nmf_solve(DenseAOp(A),
                            jnp.asarray(random_matrix(m, k, rng), DTYPE),
                            jnp.asarray(random_matrix(k, n, rng), DTYPE),
                            opts)
        finally:
            nn.set_masked_solver("auto")
        assert bool(res.success)
        assert float(relative_fnorm(A, res.W, res.H)) < 0.05


class TestSpectralInit:
    def test_rank2_quality_and_iterations(self):
        from smallk_tpu.solvers.rank2 import spectral_init_rank2
        from smallk_tpu.solvers.solve import reference_pg1

        rng = Random(3)
        m, n = 300, 200
        base = np.zeros((m, n))
        base[:150, :100] = 3.0
        base[150:, 100:] = 2.0
        A = jnp.asarray(
            base + np.asarray(random_matrix(m, n, rng)), DTYPE
        )
        aop = DenseAOp(A)
        opts = NmfOptions(tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                          prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO,
                          height=m, width=n, k=2, min_iter=1, max_iter=5000,
                          verbose=False, dtype="float64")
        W0 = jnp.asarray(random_matrix(m, 2, rng), DTYPE)
        H0 = jnp.asarray(random_matrix(2, n, rng), DTYPE)
        r_rand = nmf_solve(aop, W0, H0, opts)

        W0s, H0s = spectral_init_rank2(aop, H0)
        assert (np.asarray(W0s) >= 0).all() and (np.asarray(H0s) >= 0).all()
        pg0 = reference_pg1(aop, W0, H0, opts)
        r_spec = nmf_solve(aop, W0s, H0s, opts, pg0_hint=pg0)

        # spectral must converge (the pg0 anchor makes the ratio criterion
        # reachable from a near-optimal start) in comparable iterations, at
        # equal reconstruction quality; exact counts are case-dependent
        assert bool(r_spec.converged)
        assert int(r_spec.iterations) <= int(1.5 * int(r_rand.iterations))
        e_r = float(relative_fnorm(A, r_rand.W, r_rand.H))
        e_s = float(relative_fnorm(A, r_spec.W, r_spec.H))
        assert e_s < e_r * 1.05

    def test_masked_operand_keeps_zero_columns(self):
        from smallk_tpu.ops.aop import MaskedAOp
        from smallk_tpu.solvers.rank2 import spectral_init_rank2

        rng = Random(9)
        m, n = 60, 40
        A = jnp.asarray(np.asarray(random_matrix(m, n, rng)), DTYPE)
        mask = np.zeros(n)
        mask[: n // 2] = 1.0
        aop = MaskedAOp(DenseAOp(A), jnp.asarray(mask, DTYPE))
        H0 = jnp.asarray(random_matrix(2, n, rng), DTYPE)
        W0s, H0s = spectral_init_rank2(aop, H0)
        np.testing.assert_allclose(np.asarray(H0s)[:, n // 2:], 0.0,
                                   atol=1e-12)
        assert np.isfinite(np.asarray(W0s)).all()


class TestPallasMaskedGJ:
    """Parity of the VMEM-resident Pallas masked-GJ kernel
    (solvers/pallas_kernels.py) against the XLA masked solve, in
    interpreter mode (backend-independent).  On TPU the kernel is the
    default high-rank path (solvers/nnls.MASKED_SOLVER == "auto")."""

    @pytest.mark.parametrize("k,n", [(8, 300), (32, 257), (64, 100),
                                     (128, 130)])
    def test_interpret_parity(self, k, n):
        import smallk_tpu.solvers.nnls as nn
        from smallk_tpu.solvers.pallas_kernels import masked_gj_solve_pallas

        rng = np.random.RandomState(k)
        B = rng.rand(k, 2 * k).astype(np.float32)
        LHS = jnp.asarray(B @ B.T + 0.1 * np.eye(k), jnp.float32)
        RHS = jnp.asarray((B @ rng.rand(2 * k, n)).astype(np.float32))
        passive = jnp.asarray(rng.rand(k, n) > 0.6)

        Xp = masked_gj_solve_pallas(LHS, RHS, passive, interpret=True)
        Xr = nn._gj_solve_block(LHS, RHS, passive)
        np.testing.assert_allclose(np.asarray(Xp), np.asarray(Xr),
                                   rtol=1e-5, atol=1e-5)

    def test_dead_pivot_guard(self):
        from smallk_tpu.solvers.pallas_kernels import masked_gj_solve_pallas

        k, n = 16, 64
        rng = np.random.RandomState(0)
        W = rng.rand(3 * k, k)
        W[:, 3] = 0.0  # dead topic -> ~0 Gram diagonal
        LHS = jnp.asarray(W.T @ W, jnp.float32)
        RHS = jnp.asarray((W.T @ rng.rand(3 * k, n)).astype(np.float32))
        passive = jnp.ones((k, n), dtype=bool)
        X = masked_gj_solve_pallas(LHS, RHS, passive, interpret=True)
        assert np.isfinite(np.asarray(X)).all()
        np.testing.assert_allclose(np.asarray(X)[3], 0.0, atol=1e-5)


class TestWidthReducedPivot:
    def test_matches_full_width_exactly(self):
        """The width-reduced pivot scheduler (nnls._REDUCE_*) replays the
        same per-column pivot sequences as the full-width body."""
        import smallk_tpu.solvers.nnls as nn

        rng = np.random.RandomState(0)
        k, n = 48, 2500
        B = rng.rand(k, 2 * k)
        LHS = jnp.asarray(B @ B.T + 0.1 * np.eye(k), DTYPE)
        RHS = jnp.asarray(B @ rng.rand(2 * k, n), DTYPE)
        Xinit = jnp.asarray(rng.rand(k, n) - 0.4, DTYPE)

        X1, Y1, ok1, _ = nn.nnls_blockpivot(LHS, RHS, Xinit)
        old = nn._REDUCE_MIN_N
        try:
            nn._REDUCE_MIN_N = 10 ** 9  # force the full-width body
            X2, _, ok2, _ = nn.nnls_blockpivot(LHS, RHS, Xinit)
        finally:
            nn._REDUCE_MIN_N = old
        assert bool(ok1) and bool(ok2)
        np.testing.assert_allclose(np.asarray(X1), np.asarray(X2),
                                   atol=1e-9)
        X, Y = np.asarray(X1), np.asarray(Y1)
        assert (X >= 0).all() and np.abs(X * Y).max() < 1e-6


def test_nonfinite_inputs_fail_not_succeed():
    """Failure gates must catch Inf, not just NaN (an f32 overflow
    yields +/-Inf with no NaN): a solve fed non-finite data reports
    failure instead of returning success with Inf factors."""
    import jax.numpy as jnp

    from smallk_tpu.solvers.nnls import nnls_blockpivot

    k, n = 4, 12
    rng = np.random.RandomState(0)
    B = rng.rand(k, 3 * k)
    LHS = jnp.asarray(B @ B.T + 0.1 * np.eye(k))
    RHS = np.asarray(B @ rng.rand(3 * k, n))
    RHS[1, 3] = np.inf
    _, _, ok, _ = nnls_blockpivot(LHS, jnp.asarray(RHS),
                               jnp.asarray(rng.rand(k, n)))
    assert not bool(ok)


def test_cg_capout_surfaces_failure(monkeypatch):
    """A step-capped CG whose residual stays far above the
    backward-stable floor must poison its output (NaN) so the caller's
    isfinite gate fails the attempt — the analogue of the direct paths'
    non-SPD -> NaN -> retry-ladder failure mode, instead of silently
    feeding an approximate solution to the pivot sign tests."""
    import smallk_tpu.solvers.nnls as nn

    k, n = 32, 64
    rng = np.random.RandomState(1)
    B = rng.rand(k, 2 * k).astype(np.float32)
    LHS = jnp.asarray(B @ B.T + 0.1 * np.eye(k), jnp.float32)
    RHS = jnp.asarray((B @ rng.rand(2 * k, n)).astype(np.float32))
    passive = jnp.ones((k, n), dtype=bool)

    # healthy cap: converges and stays finite
    X = nn._cg_solve_block(LHS, RHS, passive)
    assert np.isfinite(np.asarray(X)).all()

    # strangle the cap to a single step: nowhere near converged, far
    # above the floor -> the capped columns must come back poisoned
    monkeypatch.setattr(nn, "_CG_EXTRA_STEPS", -(k - 1))
    Xc = nn._cg_solve_block(LHS, RHS, passive)
    assert np.isnan(np.asarray(Xc)).any()


def test_hals_pallas_step_parity(monkeypatch):
    """The whole-step HALS Pallas kernel (solvers/hals_pallas.py) must
    reproduce the XLA step body: same sequential sweeps, same Grams,
    same gradients (interpreter mode; the TPU smoke covers hardware)."""
    import jax.numpy as jnp

    from smallk_tpu.ops.aop import DenseAOp
    from smallk_tpu.solvers import hals

    rs = np.random.RandomState(0)
    m, n, k = 96, 80, 8
    A = jnp.asarray(rs.rand(m, n).astype(np.float32))
    W = jnp.asarray(rs.rand(m, k).astype(np.float32))
    H = jnp.asarray(rs.rand(k, n).astype(np.float32))
    op = DenseAOp(A)
    st = hals.init(op, W, H)

    monkeypatch.setattr(hals, "PALLAS_STEP", "xla")
    refW, refH, refgW, refgH, refst, refok = hals.step(op, W, H, st)
    monkeypatch.setattr(hals, "PALLAS_STEP", "pallas")
    outW, outH, outgW, outgH, outst, outok = hals.step(op, W, H, st)

    np.testing.assert_allclose(outW, refW, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(outH, refH, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(outgW, refgW, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(outgH, refgH, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(outst.HHt, refst.HHt, rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(outst.AHt, refst.AHt, rtol=2e-5,
                               atol=2e-6)
    assert bool(outok) == bool(refok)

    # zero-column rescue branch: a W column that goes all-negative must
    # be refilled with eps and unit-normalized identically on both paths
    W2 = W.at[:, 3].set(0.0)
    AHt2 = st.AHt.at[:, 3].set(-1.0)
    st2 = hals.HalsState(HHt=st.HHt, AHt=AHt2)
    monkeypatch.setattr(hals, "PALLAS_STEP", "xla")
    r2 = hals.step(op, W2, H, st2)
    monkeypatch.setattr(hals, "PALLAS_STEP", "pallas")
    o2 = hals.step(op, W2, H, st2)
    np.testing.assert_allclose(o2[0], r2[0], rtol=2e-5, atol=2e-6)


def test_loop_unroll_equivalence():
    """loop_unroll=U runs U solver steps per while-loop trip; the
    freeze logic makes results identical to unroll=1 (solve.py)."""
    import dataclasses

    import jax.numpy as jnp

    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.ops.aop import DenseAOp
    from smallk_tpu.solvers.solve import nmf_solve

    rs = np.random.RandomState(0)
    A = jnp.asarray(rs.rand(48, 40).astype(np.float32))
    W0 = jnp.asarray(rs.rand(48, 6).astype(np.float32))
    H0 = jnp.asarray(rs.rand(6, 40).astype(np.float32))
    base = NmfOptions(tol=1e-3, algorithm=NmfAlgorithm.HALS, height=48,
                      width=40, k=6, min_iter=1, max_iter=500,
                      verbose=False)
    r1 = nmf_solve(DenseAOp(A), W0, H0, base)
    r4 = nmf_solve(DenseAOp(A), W0, H0,
                   dataclasses.replace(base, loop_unroll=4))
    assert int(r1.iterations) == int(r4.iterations)
    np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r4.W))
    np.testing.assert_array_equal(np.asarray(r1.H), np.asarray(r4.H))


class TestMaskedSolverDispatch:
    """The auto dispatch must route by the measured crossover: wide
    problems (n*k^3 >= _CG_MIN_WORK) to the CG tier, small ones to the
    VMEM GJ kernel (crossover grid in nnls.py / scripts/tpu_batch55-56).
    The TPU-only gate is monkeypatched so the routing logic itself is
    testable on the CPU suite."""

    def _route(self, monkeypatch, k, n):
        import smallk_tpu.solvers.nnls as nn

        called = {}
        monkeypatch.setattr(nn, "_pallas_ok", lambda dtype: True)
        monkeypatch.setattr(nn, "_cg_solve_block",
                            lambda *a, **kw: called.setdefault("cg", True))
        import smallk_tpu.solvers.pallas_kernels as pk

        monkeypatch.setattr(
            pk, "masked_gj_solve_pallas",
            lambda *a, **kw: called.setdefault("pallas", True),
        )
        LHS = jnp.asarray(np.eye(k), jnp.float32)
        RHS = jnp.ones((k, n), jnp.float32)
        passive = jnp.ones((k, n), bool)
        nn._masked_cholesky_solve(LHS, RHS, passive)
        return called

    def test_wide_routes_to_cg(self, monkeypatch):
        # reuters width at k=8: n*k^3 = 4.1e6 > 2e6 -> CG
        assert self._route(monkeypatch, 8, 7984) == {"cg": True}

    def test_small_routes_to_gj_kernel(self, monkeypatch):
        # flatclust 256-wide at k=16: 1.0e6 < 2e6 -> VMEM GJ kernel
        assert self._route(monkeypatch, 16, 256) == {"pallas": True}
