"""Convergence progress estimators.

Reference: common/include/progress_estimator_generic.hpp
  - PG_RATIO    (:75-109): projected-gradient norm ratio pg_i / pg_0
  - DELTA_FNORM (:30-70):  ||W - W_prev||_F / ||W||_F

Functional redesign: each estimator is (init, update) over an explicit state
pytree so the whole convergence check lives inside the jitted solve loop —
no host syncs per iteration.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..common.options import NmfProgressAlgorithm
from ..ops.dense import fro_norm, projected_gradient_norm


def prog_init(method: NmfProgressAlgorithm, W):
    if method == NmfProgressAlgorithm.PG_RATIO:
        # state: pg0 scalar (set on iteration 0)
        return jnp.ones((), dtype=W.dtype)
    elif method == NmfProgressAlgorithm.DELTA_FNORM:
        # state: W_prev; reference Init zeroes Wprev then runs one Compute
        # with the initial W, leaving Wprev = W_init
        return W
    raise ValueError(f"unknown progress method {method}")


def prog_update(method: NmfProgressAlgorithm, it, W, H, gradW, gradH, state,
                have_pg0: bool = False):
    """Returns (metric, new_state).  `it` is the 0-based iteration index.

    `have_pg0` (static): the PG_RATIO denominator was supplied externally
    (e.g. the PG of a random start when the solve itself begins from a
    spectral initializer, solvers/rank2.spectral_init_rank2) — iteration 0
    then measures against it instead of priming it.
    """
    if method == NmfProgressAlgorithm.PG_RATIO:
        pg = projected_gradient_norm(gradW, gradH, W, H)
        is_first = (it == 0) & (not have_pg0)
        pg0 = jnp.where(is_first, pg, state)
        metric = jnp.where(is_first, jnp.ones_like(pg), pg / pg0)
        return metric, pg0
    elif method == NmfProgressAlgorithm.DELTA_FNORM:
        diff = fro_norm(state - W)
        metric = diff / fro_norm(W)
        return metric, W
    raise ValueError(f"unknown progress method {method}")
