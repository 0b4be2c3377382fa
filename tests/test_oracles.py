"""Multi-iteration trajectory parity vs independent numpy oracles (f64).

The reference pins BPP against Matlab golden CSVs on real corpora with
fixed inits at ||delta||_F <= 1e-10 (tests/src/test_bpp.cpp:42-90); those
fixtures (smallk_data) are unavailable offline, so these tests transcribe
the reference algorithms into plain numpy — independently of the JAX
implementations — and require the JAX solvers to reproduce whole
trajectories at f64, not just single steps (tests/test_update_rules.py).

BPP oracle: NnlsBlockpivot per nnls.hpp:144-244 + nnls.cpp:18-74 (passive
sets as explicit per-column index solves, PBAR/Ninf backup rule, 1e-12
zeroize) inside the Solver_Generic_BPP alternation (nmf_solver_bpp.hpp:
342-377).  The JAX BPP rebalances W/H scale each iteration (an exact
diagonal rescaling, solvers/bpp.py); comparisons therefore use the
scale-invariant quantities: the product W @ H and the column-normalized W.
"""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from smallk_tpu.common.options import (
    NmfAlgorithm,
    NmfOptions,
    NmfProgressAlgorithm,
)
from smallk_tpu.ops.aop import DenseAOp
from smallk_tpu.solvers import bpp, hals, mu

DTYPE = jnp.float64


# ---------------------------------------------------------------- oracles

def np_nnls_blockpivot(LHS, RHS, Xinit, zero_tol=1e-12):
    """Reference NnlsBlockpivot (nnls.hpp:144-244), plain numpy."""
    k, n = RHS.shape
    PBAR = 3
    max_iter = 5 * k
    passive = Xinit > 0
    X = np.zeros((k, n))
    Y = np.zeros((k, n))

    def solve_cols(cols):
        for j in cols:
            p = passive[:, j]
            X[:, j] = 0.0
            if p.any():
                sub = LHS[np.ix_(p, p)]
                X[p, j] = np.linalg.solve(sub, RHS[p, j])
            Y[:, j] = LHS @ X[:, j] - RHS[:, j]

    solve_cols(range(n))
    X[np.abs(X) < zero_tol] = 0.0
    Y[np.abs(Y) < zero_tol] = 0.0

    P = np.full(n, PBAR, dtype=int)
    Ninf = np.full(n, k + 1, dtype=int)

    nonopt = (Y < 0) & ~passive
    infeas = (X < 0) & passive
    not_good = nonopt.sum(axis=0) + infeas.sum(axis=0)

    it = 0
    while (not_good > 0).any() and it < max_iter:
        it += 1
        notopt_cols = np.where(not_good > 0)[0]
        for j in notopt_cols:
            # UpdatePassiveSet (nnls.cpp:18-74)
            if not_good[j] < Ninf[j]:
                Ninf[j] = not_good[j]
                P[j] = PBAR
                passive[:, j] = (passive[:, j] | nonopt[:, j]) & ~infeas[:, j]
            elif P[j] >= 1:
                P[j] -= 1
                passive[:, j] = (passive[:, j] | nonopt[:, j]) & ~infeas[:, j]
            else:
                offending = np.where(nonopt[:, j] | infeas[:, j])[0]
                t = offending.max()
                passive[t, j] = ~passive[t, j]
        solve_cols(notopt_cols)
        X[np.abs(X) < zero_tol] = 0.0
        Y[np.abs(Y) < zero_tol] = 0.0
        nonopt[:] = False
        infeas[:] = False
        nonopt[:, notopt_cols] = (Y[:, notopt_cols] < 0) & ~passive[:, notopt_cols]
        infeas[:, notopt_cols] = (X[:, notopt_cols] < 0) & passive[:, notopt_cols]
        not_good = nonopt.sum(axis=0) + infeas.sum(axis=0)

    return np.maximum(X, 0.0), Y, not (not_good > 0).any()


def np_bpp_trajectory(A, W, H, iters):
    """Solver_Generic_BPP (nmf_solver_bpp.hpp:301-383), no rebalancing."""
    W, H = W.copy(), H.copy()
    Wt = W.T.copy()
    for _ in range(iters):
        WtW = W.T @ W
        WtA = W.T @ A
        H, _, ok_h = np_nnls_blockpivot(WtW, WtA, H)
        assert ok_h
        HHt = H @ H.T
        HAt = H @ A.T
        Wt, _, ok_w = np_nnls_blockpivot(HHt, HAt, Wt)
        assert ok_w
        W = Wt.T.copy()
    return W, H


def np_hals_trajectory(A, W, H, iters):
    """Solver_Generic_HALS_Da (nmf_solver_hals.hpp:122-208).

    Per the reference operator(): W sweep first, using HHt/AHt computed
    from the PREVIOUS H (Init primes them, :156-159), then WtW/WtA and the
    H sweep, then refresh HHt/AHt.
    """
    m, k = W.shape
    eps = np.finfo(np.float64).eps
    W, H = W.copy(), H.copy()
    HHt = H @ H.T
    AHt = A @ H.T
    for _ in range(iters):
        for c in range(k):
            Wc = W[:, c] + (AHt[:, c] - W @ HHt[:, c]) / HHt[c, c]
            Wc[~np.isfinite(Wc)] = 0.0
            Wc = np.maximum(Wc, 0.0)
            if (Wc == 0.0).all():
                Wc = np.full(m, eps)  # zero-column rescue (:103-109)
            W[:, c] = Wc / np.linalg.norm(Wc)
        WtW = W.T @ W
        WtA = W.T @ A
        for r in range(k):
            Hr = H[r, :] + (WtA[r, :] - WtW[r, :] @ H) / WtW[r, r]
            Hr[~np.isfinite(Hr)] = 0.0
            H[r, :] = np.maximum(Hr, 0.0)
        HHt = H @ H.T
        AHt = A @ H.T
    return W, H


def np_mu_trajectory(A, W, H, iters):
    """Solver_Generic_MU (nmf_solver_mu.hpp), eps=1e-13."""
    eps = 1e-13
    W, H = W.copy(), H.copy()
    for _ in range(iters):
        H = H * ((W.T @ A) / (W.T @ W @ H + eps))
        W = W * ((A @ H.T) / (W @ (H @ H.T) + eps))
    return W, H


# ------------------------------------------------------------------ tests

def _problem(m, n, k, seed):
    rng = np.random.RandomState(seed)
    return rng.rand(m, n), rng.rand(m, k), rng.rand(k, n)


def _unit_cols(W):
    norms = np.linalg.norm(W, axis=0)
    norms[norms == 0] = 1.0
    return W / norms


class TestBppOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("k", [4, 9])
    def test_trajectory(self, seed, k):
        iters = 25
        A, W0, H0 = _problem(30, 24, k, seed)
        Wn, Hn = np_bpp_trajectory(A, W0, H0, iters)

        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        W = jnp.asarray(W0, DTYPE)
        H = jnp.asarray(H0, DTYPE)
        state = bpp.init(a_op, W, H)
        step = jax.jit(lambda W, H, s: bpp.step(a_op, W, H, s))
        for _ in range(iters):
            W, H, _, _, state, ok = step(W, H, state)
            assert bool(ok)
        W, H = np.asarray(W), np.asarray(H)

        # scale-invariant comparison (JAX BPP rebalances W/H each iter)
        np.testing.assert_allclose(W @ H, Wn @ Hn, atol=1e-10)
        np.testing.assert_allclose(_unit_cols(W), _unit_cols(Wn), atol=1e-10)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_nnls_inner(self, seed):
        rng = np.random.RandomState(seed)
        k, n = 8, 40
        B = rng.rand(k, 3 * k)
        LHS = B @ B.T + 0.1 * np.eye(k)
        RHS = B @ rng.rand(3 * k, n)
        X0 = rng.rand(k, n) - 0.5

        Xn, _, okn = np_nnls_blockpivot(LHS, RHS, X0)
        assert okn
        from smallk_tpu.solvers.nnls import nnls_blockpivot

        Xj, _, okj, _ = nnls_blockpivot(
            jnp.asarray(LHS, DTYPE), jnp.asarray(RHS, DTYPE),
            jnp.asarray(X0, DTYPE),
        )
        assert bool(okj)
        np.testing.assert_allclose(np.asarray(Xj), Xn, atol=1e-10)


class TestHalsOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_trajectory(self, seed):
        iters = 40
        A, W0, H0 = _problem(30, 24, 5, seed)
        Wn, Hn = np_hals_trajectory(A, W0, H0, iters)

        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        W = jnp.asarray(W0, DTYPE)
        H = jnp.asarray(H0, DTYPE)
        state = hals.init(a_op, W, H)
        step = jax.jit(lambda W, H, s: hals.step(a_op, W, H, s))
        for _ in range(iters):
            W, H, _, _, state, ok = step(W, H, state)
            assert bool(ok)
        np.testing.assert_allclose(np.asarray(W), Wn, atol=1e-10)
        np.testing.assert_allclose(np.asarray(H), Hn, atol=1e-10)


class TestMuOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_trajectory(self, seed):
        iters = 50
        A, W0, H0 = _problem(30, 24, 5, seed)
        Wn, Hn = np_mu_trajectory(A, W0, H0, iters)

        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        W = jnp.asarray(W0, DTYPE)
        H = jnp.asarray(H0, DTYPE)
        state = mu.init(a_op, W, H)
        step = jax.jit(lambda W, H, s: mu.step(a_op, W, H, s))
        for _ in range(iters):
            W, H, _, _, state, ok = step(W, H, state)
            assert bool(ok)
        np.testing.assert_allclose(np.asarray(W), Wn, atol=1e-10)
        np.testing.assert_allclose(np.asarray(H), Hn, atol=1e-10)


def np_rank2_trajectory(A, W0, H0, iters):
    """Reference rank-2 alternation (nmf_solver_rank2.hpp: solve H via
    the 2x2 normal equations, negative/NaN fixup by the larger-norm
    single-column fallback, then W likewise, then normalize W's columns
    and rescale H) transcribed into plain numpy."""
    W, H = W0.copy(), H0.copy()

    def fixup_cols(X, G, R):
        # X (2, n) solution of G X = R; fallback per column where any
        # entry is <= 0: keep the single component with the larger
        # scaled value, zero the other (nmf_solver_rank2.hpp fixup)
        v1 = R[0] / G[0, 0]
        v2 = R[1] / G[1, 1]
        pick1 = v1 * np.sqrt(G[0, 0]) >= v2 * np.sqrt(G[1, 1])
        bad = (X[0] <= 0) | (X[1] <= 0)
        out = X.copy()
        out[0] = np.where(bad, np.where(pick1, v1, 0.0), X[0])
        out[1] = np.where(bad, np.where(pick1, 0.0, v2), X[1])
        return out

    for _ in range(iters):
        WtW = W.T @ W
        WtA = W.T @ A
        H = fixup_cols(np.linalg.solve(WtW, WtA), WtW, WtA)
        HHt = H @ H.T
        AHt = A @ H.T
        # solve W HHt = AHt via HHt^T W^T = AHt^T; fixup in (2, m) form
        W = fixup_cols(np.linalg.solve(HHt.T, AHt.T), HHt, AHt.T).T
        norms = np.linalg.norm(W, axis=0)
        W = W / norms
        H = H * norms[:, None]
    return W, H


class TestRank2Oracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_trajectory(self, seed):
        from smallk_tpu.solvers import rank2

        iters = 30
        rng = np.random.RandomState(seed)
        A = rng.rand(30, 24)
        W0 = rng.rand(30, 2)
        H0 = rng.rand(2, 24)
        Wn, Hn = np_rank2_trajectory(A, W0, H0, iters)

        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        W = jnp.asarray(W0, DTYPE)
        H = jnp.asarray(H0, DTYPE)
        state = rank2.init(a_op, W, H)
        step = jax.jit(lambda W, H, s: rank2.step(a_op, W, H, s))
        for _ in range(iters):
            W, H, _, _, state, ok = step(W, H, state)
            assert bool(ok)
        np.testing.assert_allclose(np.asarray(W), Wn, rtol=1e-9,
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(H), Hn, rtol=1e-9,
                                   atol=1e-11)
