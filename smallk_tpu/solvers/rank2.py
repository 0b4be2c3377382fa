"""Rank-2 NMF solver (Kuang-Park), the hierclust workhorse.

Reference: common/include/nmf_solver_rank2.hpp
  - SystemSolveH (:25-135): closed-form 2x2 solve of W'W H = W'A via a fast
    Givens rotation with dynamic scaling (Anda-Park), cosine/sine forms.
  - SystemSolveW (:139-212): same for W (HH') = AH'.
  - OptimalActiveSetH/W (:216-318): per-column/row optimal fix-up of
    negative entries.
  - Solver_Generic_Rank2 (:323-461): normalizes every iteration and rescales
    HH'/AH' by the returned scale factors instead of recomputing them.

TPU-native form: the per-column/row backsubstitution loops vectorize over
the whole 2 x n (or m x 2) factor at once; the scalar cosine/sine branch
becomes a jnp.where select over both precomputed forms (both are two flops —
cheaper than a branch on device).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.dense import gemm, gram, gram_t, normalize_and_scale


class Rank2State(NamedTuple):
    WtW: jnp.ndarray  # 2 x 2
    WtA: jnp.ndarray  # 2 x n


def init(a_op, W, H) -> Rank2State:
    return Rank2State(WtW=gram(W), WtA=a_op.mm_tn(W))


def _system_solve_h(A, B):
    """Solve A @ X = B columnwise, A 2x2 SPD-ish, B 2xn.

    Returns (X, ok).  Mirrors reference SystemSolveH including its
    singularity checks (|A00|,|A01| < eps; |d2/a2| < eps).
    """
    dtype = B.dtype
    eps = jnp.finfo(dtype).eps
    a00, a01 = A[0, 0], A[0, 1]
    a10, a11 = A[1, 0], A[1, 1]
    use_cos = jnp.abs(a00) >= jnp.abs(a01)

    # cosine form (t = tangent)
    t = -a10 / jnp.where(a00 == 0, eps, a00)
    a2_c = a00 - t * a10
    b2_c = a01 - t * a11
    d2_c = a11 + t * a01
    e2_c = B[0, :] - t * B[1, :]
    f2_c = B[1, :] + t * B[0, :]

    # sine form (ct = cotangent)
    ct = -a00 / jnp.where(a10 == 0, eps, a10)
    a2_s = -a10 + ct * a00
    b2_s = -a11 + ct * a01
    d2_s = a01 + ct * a11
    e2_s = -B[1, :] + ct * B[0, :]
    f2_s = B[0, :] + ct * B[1, :]

    a2 = jnp.where(use_cos, a2_c, a2_s)
    b2 = jnp.where(use_cos, b2_c, b2_s)
    d2 = jnp.where(use_cos, d2_c, d2_s)
    e2 = jnp.where(use_cos, e2_c, e2_s)
    f2 = jnp.where(use_cos, f2_c, f2_s)

    singular = (jnp.abs(a00) < eps) & (jnp.abs(a01) < eps)
    degenerate = jnp.abs(d2 / a2) < eps
    ok = jnp.logical_not(singular | degenerate)

    x1 = f2 / d2
    x0 = (e2 - b2 * x1) / a2
    return jnp.stack([x0, x1], axis=0), ok


def _system_solve_w(A, B):
    """Solve X @ A = B rowwise, A 2x2, B mx2.  Returns (X, ok)."""
    dtype = B.dtype
    eps = jnp.finfo(dtype).eps
    a00, a01 = A[0, 0], A[0, 1]
    a10, a11 = A[1, 0], A[1, 1]
    use_cos = jnp.abs(a00) >= jnp.abs(a01)

    t = a01 / jnp.where(a00 == 0, eps, a00)
    a2_c = a00 + t * a01
    b2_c = a10 + t * a11
    d2_c = a11 - t * a10
    e2_c = B[:, 0] + t * B[:, 1]
    f2_c = B[:, 1] - t * B[:, 0]

    ct = a00 / jnp.where(a01 == 0, eps, a01)
    a2_s = -a01 - ct * a00
    b2_s = -a11 - ct * a10
    d2_s = a10 - ct * a11
    e2_s = -B[:, 1] - ct * B[:, 0]
    f2_s = B[:, 0] - ct * B[:, 1]

    a2 = jnp.where(use_cos, a2_c, a2_s)
    b2 = jnp.where(use_cos, b2_c, b2_s)
    d2 = jnp.where(use_cos, d2_c, d2_s)
    e2 = jnp.where(use_cos, e2_c, e2_s)
    f2 = jnp.where(use_cos, f2_c, f2_s)

    singular = (jnp.abs(a00) < eps) & (jnp.abs(a01) < eps)
    degenerate = jnp.abs(d2 / a2) < eps
    ok = jnp.logical_not(singular | degenerate)

    x1 = f2 / d2
    x0 = (e2 - b2 * x1) / a2
    return jnp.stack([x0, x1], axis=1), ok


def _optimal_active_set_h(H, WtW, WtA):
    """Columnwise optimal fix-up of negative H entries (reference :216-265)."""
    w00, w11 = WtW[0, 0], WtW[1, 1]
    v1 = WtA[0, :] / w00
    v2 = WtA[1, :] / w11
    vv1 = v1 * jnp.sqrt(w00)
    vv2 = v2 * jnp.sqrt(w11)
    pick1 = vv1 >= vv2
    v1 = jnp.where(pick1, v1, 0.0)
    v2 = jnp.where(pick1, 0.0, v2)
    needs_fix = (H[0, :] <= 0) | (H[1, :] <= 0)
    h0 = jnp.where(needs_fix, v1, H[0, :])
    h1 = jnp.where(needs_fix, v2, H[1, :])
    return jnp.stack([h0, h1], axis=0)


def _optimal_active_set_w(W, HHt, AHt):
    """Rowwise optimal fix-up of negative W entries (reference :269-318)."""
    h00, h11 = HHt[0, 0], HHt[1, 1]
    v1 = AHt[:, 0] / h00
    v2 = AHt[:, 1] / h11
    vv1 = v1 * jnp.sqrt(h00)
    vv2 = v2 * jnp.sqrt(h11)
    pick1 = vv1 >= vv2
    v1 = jnp.where(pick1, v1, 0.0)
    v2 = jnp.where(pick1, 0.0, v2)
    needs_fix = (W[:, 0] <= 0) | (W[:, 1] <= 0)
    w0 = jnp.where(needs_fix, v1, W[:, 0])
    w1 = jnp.where(needs_fix, v2, W[:, 1])
    return jnp.stack([w0, w1], axis=1)


def step(a_op, W, H, state: Rank2State):
    WtW, WtA = state

    # solve W'W H = W'A, then optimal active-set fix-up
    H, ok_h = _system_solve_h(WtW, WtA)
    H = _optimal_active_set_h(H, WtW, WtA)

    HHt = gram_t(H)
    AHt = a_op.mm_nt(H)

    # solve W (HH') = AH'
    W, ok_w = _system_solve_w(HHt, AHt)
    W = _optimal_active_set_w(W, HHt, AHt)

    # per-iteration normalization; rescale HH'/AH' by the factors instead of
    # recomputing (reference :429-442)
    W, H, norms = normalize_and_scale(W, H)
    norms_ok = jnp.all(norms > jnp.finfo(W.dtype).eps)
    HHt = HHt * jnp.outer(norms, norms)
    AHt = AHt * norms[None, :]

    gradW = gemm(W, HHt) - AHt

    WtW = gram(W)
    WtA = a_op.mm_tn(W)
    gradH = gemm(WtW, H) - WtA

    ok = ok_h & ok_w & norms_ok
    # isfinite, not just not-NaN: f32 overflow yields Inf without NaN
    ok = ok & jnp.all(jnp.isfinite(gradW)) & jnp.all(jnp.isfinite(gradH))
    return W, H, gradW, gradH, Rank2State(WtW=WtW, WtA=WtA), ok


# Subspace-iteration count for the spectral initializer (module knob:
# each power iteration costs ~1 NMF iteration of A-bandwidth; text
# corpora have strong top-2 gaps, so few iterations suffice).
SPECTRAL_POWER_ITERS = 6


# --- transposed-W formulation -------------------------------------------
#
# A (m, 2) array is stored lane-padded to (m, 128) tiles on TPU: every
# materialization (while-loop carries, matmul outputs, fusion
# boundaries) costs 64x its logical bytes of real HBM traffic — at
# hierclust scale (m ~ 40k) that is ~20 MB per touch, a measurable
# per-iteration tax on an otherwise A-stream-bound solve.  The rank-2
# f32 path therefore carries W TRANSPOSED as Wt (2, m) (sublane padding
# only: 4x), with the products contracted directly into the (2, m)
# orientation (aop.mm_tn_t / mm_nt_t).  The scalar Givens/active-set
# formulas below are the SAME operations as the untransposed versions,
# element for element — only the layout differs.  The f64 path keeps
# the untransposed form (pinned by the numpy trajectory oracles).


def _mm_tn_t(a_op, Wt):
    f = getattr(a_op, "mm_tn_t", None)
    return f(Wt) if f is not None else a_op.mm_tn(Wt.T)


def _mm_nt_t(a_op, H):
    f = getattr(a_op, "mm_nt_t", None)
    return f(H) if f is not None else a_op.mm_nt(H).T


def _system_solve_w_t(A, Bt):
    """Transposed _system_solve_w: solve X @ A = B with X as Xt (2, m),
    Bt (2, m).  Same scalar forms (cosine/sine Givens), vectors along
    axis 1."""
    dtype = Bt.dtype
    eps = jnp.finfo(dtype).eps
    a00, a01 = A[0, 0], A[0, 1]
    a10, a11 = A[1, 0], A[1, 1]
    use_cos = jnp.abs(a00) >= jnp.abs(a01)

    t = a01 / jnp.where(a00 == 0, eps, a00)
    a2_c = a00 + t * a01
    b2_c = a10 + t * a11
    d2_c = a11 - t * a10
    e2_c = Bt[0, :] + t * Bt[1, :]
    f2_c = Bt[1, :] - t * Bt[0, :]

    ct = a00 / jnp.where(a01 == 0, eps, a01)
    a2_s = -a01 - ct * a00
    b2_s = -a11 - ct * a10
    d2_s = a10 - ct * a11
    e2_s = -Bt[1, :] - ct * Bt[0, :]
    f2_s = Bt[0, :] - ct * Bt[1, :]

    a2 = jnp.where(use_cos, a2_c, a2_s)
    b2 = jnp.where(use_cos, b2_c, b2_s)
    d2 = jnp.where(use_cos, d2_c, d2_s)
    e2 = jnp.where(use_cos, e2_c, e2_s)
    f2 = jnp.where(use_cos, f2_c, f2_s)

    singular = (jnp.abs(a00) < eps) & (jnp.abs(a01) < eps)
    degenerate = jnp.abs(d2 / a2) < eps
    ok = jnp.logical_not(singular | degenerate)

    x1 = f2 / d2
    x0 = (e2 - b2 * x1) / a2
    return jnp.stack([x0, x1], axis=0), ok


def _optimal_active_set_w_t(Wt, HHt, AHtT):
    """Transposed _optimal_active_set_w: rows of Wt are W's columns."""
    h00, h11 = HHt[0, 0], HHt[1, 1]
    v1 = AHtT[0, :] / h00
    v2 = AHtT[1, :] / h11
    vv1 = v1 * jnp.sqrt(h00)
    vv2 = v2 * jnp.sqrt(h11)
    pick1 = vv1 >= vv2
    v1 = jnp.where(pick1, v1, 0.0)
    v2 = jnp.where(pick1, 0.0, v2)
    needs_fix = (Wt[0, :] <= 0) | (Wt[1, :] <= 0)
    w0 = jnp.where(needs_fix, v1, Wt[0, :])
    w1 = jnp.where(needs_fix, v2, Wt[1, :])
    return jnp.stack([w0, w1], axis=0)


def _normalize_and_scale_t(Wt, H):
    """normalize_and_scale with W transposed: unit-L2 rows of Wt,
    inversely scaled rows of H.  Same formula as ops/dense."""
    norms = jnp.sqrt(jnp.sum(jnp.square(Wt), axis=1))  # (2,)
    eps = jnp.finfo(Wt.dtype).eps
    safe = jnp.maximum(norms, eps)
    Wt_out = Wt / safe[:, None]
    H_out = H * norms[:, None]
    return Wt_out, H_out, norms


def init_t(a_op, Wt, H) -> Rank2State:
    return Rank2State(WtW=gram_t(Wt), WtA=_mm_tn_t(a_op, Wt))


def step_t(a_op, Wt, H, state: Rank2State):
    """rank2.step with W carried as Wt (2, m); same update sequence."""
    WtW, WtA = state

    H, ok_h = _system_solve_h(WtW, WtA)
    H = _optimal_active_set_h(H, WtW, WtA)

    HHt = gram_t(H)
    AHtT = _mm_nt_t(a_op, H)          # (2, m)

    Wt, ok_w = _system_solve_w_t(HHt, AHtT)
    Wt = _optimal_active_set_w_t(Wt, HHt, AHtT)

    Wt, H, norms = _normalize_and_scale_t(Wt, H)
    norms_ok = jnp.all(norms > jnp.finfo(Wt.dtype).eps)
    HHt = HHt * jnp.outer(norms, norms)
    AHtT = AHtT * norms[:, None]

    gradWt = gemm(HHt, Wt) - AHtT      # (2, m); HHt symmetric

    WtW = gram_t(Wt)
    WtA = _mm_tn_t(a_op, Wt)
    gradH = gemm(WtW, H) - WtA

    ok = ok_h & ok_w & norms_ok
    ok = ok & jnp.all(jnp.isfinite(gradWt)) & jnp.all(jnp.isfinite(gradH))
    return Wt, H, gradWt, gradH, Rank2State(WtW=WtW, WtA=WtA), ok


class _TransposedRank2:
    """Solver adapter: rank-2 with the W factor carried as Wt (2, m).
    solve.py selects this for the f32 rank-2 path and transposes W0 in
    and W out around the while_loop."""

    init = staticmethod(init_t)
    step = staticmethod(step_t)


transposed = _TransposedRank2()


@functools.partial(jax.jit, static_argnames=("power_iters",))
def spectral_init_rank2(a_op, v0, power_iters: int = 6):
    """Spectral rank-2 initializer from the top-2 singular pair.

    The reference initializes every node factorization with uniform random
    W/H (clust_hier_generic.hpp:548-566) and pays for it in iterations —
    the dominant hierclust cost is the solve-loop iteration count, not the
    per-iteration kernels.  A rank-2 NMF optimum of a nonnegative A lies
    (approximately) in the span of its top-2 singular vectors, so a few
    subspace-iteration steps (pure MXU matmuls costing ~1 NMF iteration
    each) start the solver near the optimum instead of at noise.

    The nonnegative projection keeps BOTH sign-sides of the second
    singular direction: w_± = relu(s1 u1 ± s2 u2) are the two cluster
    centroid estimates of the natural rank-2 bipartition (documents
    split by the sign of v2), measurably better than the one-sided
    NNDSVD projection on both term-doc and graph operands (fewer
    iterations, balanced first splits).

    v0: (2, n) start block (a random draw; zero columns of a masked
    operand must be zero here and stay zero throughout).
    Returns (W0 (m, 2), H0 (2, n)), both nonnegative.
    """
    dtype = v0.dtype
    eps = jnp.finfo(dtype).eps

    def orth2(U):
        u0 = U[:, 0]
        u0 = u0 / jnp.maximum(jnp.linalg.norm(u0), eps)
        u1 = U[:, 1] - jnp.dot(u0, U[:, 1]) * u0
        u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), eps)
        return jnp.stack([u0, u1], axis=1)

    V = v0
    def body(_, V):
        U = orth2(a_op.mm_nt(V))   # (m, 2) = A V^T, orthonormalized
        return a_op.mm_tn(U)       # (2, n) = U^T A

    V = jax.lax.fori_loop(0, power_iters, body, V)
    U = orth2(a_op.mm_nt(V))
    V = a_op.mm_tn(U)

    # rotate to singular pairs: eigh of the 2x2 Gram of V's rows
    G = gram_t(V)  # 2x2
    evals, E = jnp.linalg.eigh(G)  # ascending
    s = jnp.sqrt(jnp.maximum(evals[::-1], 0.0))  # descending singular values
    E = E[:, ::-1]
    Vr = gemm(E.T, V)       # rows: s_i * v_i^T
    Ur = gemm(U, E)         # cols: u_i

    u1 = jnp.abs(Ur[:, 0])                  # Perron: leading pair is sign-fixable
    v1 = jnp.abs(Vr[0]) / jnp.maximum(s[0], eps)
    u2 = Ur[:, 1]
    v2 = Vr[1] / jnp.maximum(s[1], eps)

    w_a = jnp.maximum(s[0] * u1 + s[1] * u2, 0.0)
    w_b = jnp.maximum(s[0] * u1 - s[1] * u2, 0.0)
    h_a = jnp.maximum(v1 + v2, 0.0)
    h_b = jnp.maximum(v1 - v2, 0.0)

    W0 = jnp.stack([w_a, w_b], axis=1)
    H0 = jnp.stack([h_a, h_b], axis=0)
    return W0, H0
