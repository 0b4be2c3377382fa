"""Single-step update-rule parity vs handwritten numpy implementations.

Pins the exact update formulas of each solver step to independent numpy
transcriptions of the reference math (nmf_solver_mu.hpp, nmf_solver_hals.hpp,
nmf_solver_rank2.hpp), complementing the behavioral tests: a refactor that
changes any update rule breaks these even if convergence still "works".
"""

import numpy as np
import pytest

import jax.numpy as jnp

from smallk_tpu.ops.aop import DenseAOp
from smallk_tpu.solvers import hals, mu, rank2

DTYPE = jnp.float64


def _problem(m=24, n=20, k=4, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(m, n), rng.rand(m, k), rng.rand(k, n)


class TestMuStep:
    @pytest.mark.parametrize("seed", range(3))
    def test_one_step(self, seed):
        A, W, H = _problem(seed=seed)
        eps = mu.EPSILON

        # numpy transcription of Update_H_MU / Update_W_MU
        WtA = W.T @ A
        WtW = W.T @ W
        H2 = H * (WtA / (WtW @ H + eps))
        HHt = H2 @ H2.T
        AHt = A @ H2.T
        W2 = W * (AHt / (W @ HHt + eps))
        gradW = W2 @ HHt - AHt
        gradH = (W2.T @ W2) @ H2 - W2.T @ A

        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        Wd, Hd = jnp.asarray(W, DTYPE), jnp.asarray(H, DTYPE)
        state = mu.init(a_op, Wd, Hd)
        Wo, Ho, gWo, gHo, _, ok = mu.step(a_op, Wd, Hd, state)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(Ho), H2, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(Wo), W2, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(gWo), gradW, atol=1e-12)
        np.testing.assert_allclose(np.asarray(gHo), gradH, atol=1e-12)


class TestHalsStep:
    @pytest.mark.parametrize("seed", range(3))
    def test_one_step(self, seed):
        A, W, H = _problem(seed=seed)
        m, k = W.shape

        # numpy transcription of UpdateW_Hals then UpdateH_Hals
        # (reference step order: W first, using HHt/AHt of the incoming H)
        HHt = H @ H.T
        AHt = A @ H.T
        W2 = W.copy()
        for c in range(k):
            w = W2[:, c] + (AHt[:, c] - W2 @ HHt[:, c]) / HHt[c, c]
            w = np.where(np.isnan(w) | (w < 0), 0.0, w)
            if (w == 0).all():
                w = np.full(m, np.finfo(np.float64).eps)
            W2[:, c] = w / np.linalg.norm(w)
        WtW = W2.T @ W2
        WtA = W2.T @ A
        H2 = H.copy()
        for r in range(k):
            h = H2[r, :] + (WtA[r, :] - WtW[r, :] @ H2) / WtW[r, r]
            H2[r, :] = np.where(np.isnan(h) | (h < 0), 0.0, h)

        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        Wd, Hd = jnp.asarray(W, DTYPE), jnp.asarray(H, DTYPE)
        state = hals.init(a_op, Wd, Hd)
        Wo, Ho, gWo, gHo, _, ok = hals.step(a_op, Wd, Hd, state)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(Wo), W2, rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(Ho), H2, rtol=1e-10,
                                   atol=1e-12)


class TestRank2Step:
    @pytest.mark.parametrize("seed", range(3))
    def test_one_step(self, seed):
        A, W, H = _problem(k=2, seed=seed)

        # numpy transcription of the rank-2 step (solver class order:
        # solve H, fix up, recompute HHt/AHt, solve W, fix up, normalize)
        WtW = W.T @ W
        WtA = W.T @ A
        H2 = np.linalg.solve(WtW, WtA)

        def fixup_h(Hx, WtW, WtA):
            v1 = WtA[0] / WtW[0, 0]
            v2 = WtA[1] / WtW[1, 1]
            pick1 = v1 * np.sqrt(WtW[0, 0]) >= v2 * np.sqrt(WtW[1, 1])
            v1s = np.where(pick1, v1, 0.0)
            v2s = np.where(pick1, 0.0, v2)
            bad = (Hx[0] <= 0) | (Hx[1] <= 0)
            out = Hx.copy()
            out[0] = np.where(bad, v1s, Hx[0])
            out[1] = np.where(bad, v2s, Hx[1])
            return out

        H2 = fixup_h(H2, WtW, WtA)
        HHt = H2 @ H2.T
        AHt = A @ H2.T
        W2 = np.linalg.solve(HHt.T, AHt.T).T  # solve W HHt = AHt

        v1 = AHt[:, 0] / HHt[0, 0]
        v2 = AHt[:, 1] / HHt[1, 1]
        pick1 = v1 * np.sqrt(HHt[0, 0]) >= v2 * np.sqrt(HHt[1, 1])
        bad = (W2[:, 0] <= 0) | (W2[:, 1] <= 0)
        W2[:, 0] = np.where(bad, np.where(pick1, v1, 0.0), W2[:, 0])
        W2[:, 1] = np.where(bad, np.where(pick1, 0.0, v2), W2[:, 1])

        norms = np.linalg.norm(W2, axis=0)
        W2 = W2 / norms
        H2 = H2 * norms[:, None]

        a_op = DenseAOp(jnp.asarray(A, DTYPE))
        Wd, Hd = jnp.asarray(W, DTYPE), jnp.asarray(H, DTYPE)
        state = rank2.init(a_op, Wd, Hd)
        Wo, Ho, gWo, gHo, _, ok = rank2.step(a_op, Wd, Hd, state)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(Ho), H2, rtol=1e-9,
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(Wo), W2, rtol=1e-9,
                                   atol=1e-11)
