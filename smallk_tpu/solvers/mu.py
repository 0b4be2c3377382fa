"""Multiplicative-update (Lee-Seung) NMF solver.

Reference: common/include/nmf_solver_mu.hpp
  H = H .* (W'A) ./ (W'W H + eps)
  W = W .* (AH') ./ (W HH' + eps)      eps = 1e-13  (:22)

TPU-native form: the elementwise updates fuse into the surrounding matmuls
under XLA; the solver is a pure (state in, state out) step usable inside
lax.while_loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.dense import gemm, gram, gram_t

EPSILON = 1.0e-13


class MuState(NamedTuple):
    WtW: jnp.ndarray  # k x k
    WtA: jnp.ndarray  # k x n


def init(a_op, W, H) -> MuState:
    return MuState(WtW=gram(W), WtA=a_op.mm_tn(W))


def step(a_op, W, H, state: MuState):
    WtW, WtA = state

    # H update
    WtWH = gemm(WtW, H)
    H = H * (WtA / (WtWH + EPSILON))

    # W update
    HHt = gram_t(H)
    AHt = a_op.mm_nt(H)
    WHHt = gemm(W, HHt)
    W = W * (AHt / (WHHt + EPSILON))

    # gradients with updated factors
    WtA = a_op.mm_tn(W)
    WtW = gram(W)
    gradW = gemm(W, HHt) - AHt
    gradH = gemm(WtW, H) - WtA

    # isfinite, not just not-NaN: f32 overflow yields Inf without NaN
    ok = jnp.all(jnp.isfinite(gradW)) & jnp.all(jnp.isfinite(gradH))
    return W, H, gradW, gradH, MuState(WtW=WtW, WtA=WtA), ok
