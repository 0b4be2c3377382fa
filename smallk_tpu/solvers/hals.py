"""HALS (hierarchical alternating least squares, Cichocki 'Da' variant).

Reference: common/include/nmf_solver_hals.hpp
  For each row r of H (sequentially, using partially-updated H):
      H(r,:) = clamp0( H(r,:) + (W'A(r,:) - W'W(r,:) H) / W'W(r,r) )   (:26-62)
  For each column c of W (sequentially):
      W(:,c) = clamp0( W(:,c) + (AH'(:,c) - W HH'(:,c)) / HH'(c,c) )
      all-zero column -> filled with machine eps                        (:103-109)
      column normalized to unit L2                                      (:111-116)

TPU-native form: the k sequential row/col sweeps become a lax.fori_loop of
rank-1 updates (k is small); the heavy products (W'A, AH') stay as full
MXU matmuls outside the sweep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.dense import gemm, gram, gram_t


class HalsState(NamedTuple):
    HHt: jnp.ndarray  # k x k
    AHt: jnp.ndarray  # m x k


def init(a_op, W, H) -> HalsState:
    return HalsState(HHt=gram_t(H), AHt=a_op.mm_nt(H))


def update_h(H, WtW, WtA):
    """Sequential HALS row sweep over H (reference UpdateH_Hals)."""
    k = H.shape[0]

    def body(r, H):
        wtw_r = jax.lax.dynamic_slice_in_dim(WtW, r, 1, axis=0)  # (1, k)
        wtwh_r = gemm(wtw_r, H)  # (1, n)
        wtw_rr = jax.lax.dynamic_slice(WtW, (r, r), (1, 1))  # (1,1)
        h_r = jax.lax.dynamic_slice_in_dim(H, r, 1, axis=0)
        wta_r = jax.lax.dynamic_slice_in_dim(WtA, r, 1, axis=0)
        h_new = h_r + (wta_r - wtwh_r) / wtw_rr
        h_new = jnp.where(jnp.isnan(h_new) | (h_new < 0), 0.0, h_new)
        return jax.lax.dynamic_update_slice_in_dim(H, h_new, r, axis=0)

    return jax.lax.fori_loop(0, k, body, H)


def update_w(W, HHt, AHt):
    """Sequential HALS column sweep over W with zero-column rescue and
    per-column normalization (reference UpdateW_Hals)."""
    k = W.shape[1]
    eps = jnp.finfo(W.dtype).eps

    def body(c, W):
        hht_c = jax.lax.dynamic_slice_in_dim(HHt, c, 1, axis=1)  # (k, 1)
        whht_c = gemm(W, hht_c)  # (m, 1)
        hht_cc = jax.lax.dynamic_slice(HHt, (c, c), (1, 1))
        w_c = jax.lax.dynamic_slice_in_dim(W, c, 1, axis=1)
        aht_c = jax.lax.dynamic_slice_in_dim(AHt, c, 1, axis=1)
        w_new = w_c + (aht_c - whht_c) / hht_cc
        w_new = jnp.where(jnp.isnan(w_new) | (w_new < 0), 0.0, w_new)
        # all-zero column rescue
        all_zero = jnp.all(w_new == 0)
        w_new = jnp.where(all_zero, jnp.full_like(w_new, eps), w_new)
        # unit L2 normalization
        norm = jnp.sqrt(jnp.sum(jnp.square(w_new)))
        w_new = w_new / norm
        return jax.lax.dynamic_update_slice_in_dim(W, w_new, c, axis=1)

    return jax.lax.fori_loop(0, k, body, W)


# Whole-step Pallas kernel dispatch (solvers/hals_pallas.py): at small
# dense shapes the XLA step is latency-bound (~100 dispatched ops per
# iteration); the kernel runs the full step as ONE program.  Module
# knob for benchmarking/ablation.
PALLAS_STEP = "auto"   # "auto" | "xla" | "pallas"


def _pallas_step_ok(a_op, W, H) -> bool:
    from ..ops.aop import DenseAOp

    if PALLAS_STEP == "xla":
        return False
    if not (isinstance(a_op, DenseAOp) and W.dtype == jnp.float32
            and a_op.A.dtype in (jnp.float32, jnp.bfloat16)):
        return False
    if PALLAS_STEP != "pallas" and jax.default_backend() not in (
            "tpu", "axon"):
        return False
    from .hals_pallas import hals_fits

    m, k = W.shape
    return hals_fits(m, H.shape[1], k, a_op.A.dtype.itemsize)


def step(a_op, W, H, state: HalsState):
    HHt, AHt = state

    if _pallas_step_ok(a_op, W, H):
        from .hals_pallas import hals_step_pallas

        interpret = jax.default_backend() == "cpu"
        W, H, gradW, gradH, HHt, AHt = hals_step_pallas(
            a_op.A, W, H, HHt, AHt, interpret=interpret,
        )
        ok = (jnp.all(jnp.isfinite(gradW))
              & jnp.all(jnp.isfinite(gradH)))
        return W, H, gradW, gradH, HalsState(HHt=HHt, AHt=AHt), ok

    W = update_w(W, HHt, AHt)

    WtW = gram(W)
    WtA = a_op.mm_tn(W)

    H = update_h(H, WtW, WtA)

    gradH = gemm(WtW, H) - WtA

    HHt = gram_t(H)
    AHt = a_op.mm_nt(H)
    gradW = gemm(W, HHt) - AHt

    # isfinite, not just not-NaN: f32 overflow yields Inf without NaN
    ok = jnp.all(jnp.isfinite(gradW)) & jnp.all(jnp.isfinite(gradH))
    return W, H, gradW, gradH, HalsState(HHt=HHt, AHt=AHt), ok
