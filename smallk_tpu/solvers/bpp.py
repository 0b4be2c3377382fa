"""ANLS block-principal-pivoting NMF solver (Kim-Park).

Reference: common/include/nmf_solver_bpp.hpp (Solver_Generic_BPP :301-383):
alternate NnlsBlockpivot(W'W, W'A) -> H and NnlsBlockpivot(HH', HA') -> W',
warm-starting each NNLS from the previous factors; recompute gradH with the
updated W after both solves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.dense import gemm, gram, gram_t, normalize_and_scale
from .nnls import nnls_blockpivot


class BppState(NamedTuple):
    Wt: jnp.ndarray   # k x m (warm start for the W-side NNLS)
    WtW: jnp.ndarray  # k x k
    WtA: jnp.ndarray  # k x n
    pivot_rounds: jnp.ndarray  # cumulative NNLS pivot rounds (int32)


def init(a_op, W, H) -> BppState:
    return BppState(Wt=W.T, WtW=gram(W), WtA=a_op.mm_tn(W),
                    pivot_rounds=jnp.zeros((), jnp.int32))


def step(a_op, W, H, state: BppState):
    Wt, WtW, WtA, rounds = state

    # H-side: solve (W'W) H = W'A with H >= 0
    H, gradH, ok_h, r_h = nnls_blockpivot(WtW, WtA, H)

    # W-side: solve (HH') W' = H A' with W' >= 0
    HHt = gram_t(H)
    HAt = a_op.mm_nt(H).T  # (k, m) == H @ A'
    Wt, gradWt, ok_w, r_w = nnls_blockpivot(HHt, HAt, Wt)

    W = Wt.T

    # Per-iteration W/H scale rebalancing (product-invariant: unit-norm W
    # columns, inversely scaled H rows).  The reference does not rebalance
    # inside BPP — it runs f64, where the W-up/H-down scale drift of
    # alternating NNLS stays negligible.  In f32 the drift compounds:
    # kappa(W'W) grows with the scale imbalance, degrading the masked
    # solves until topics collapse (empirically: divergence after ~400
    # iterations at k=32).  Rebalancing pins the conditioning and
    # reproduces the f64 trajectory.
    W, H, norms = normalize_and_scale(W, H)
    Wt = W.T
    # gradient at the rebalanced point: dL/dW_new = dL/dW_old * diag(norms)
    gradW = gradWt.T * norms[None, :]

    # recompute gradH with the updated W (reference :366-374)
    WtW = gram(W)
    WtA = a_op.mm_tn(W)
    gradH = gemm(WtW, H) - WtA

    ok = ok_h & ok_w
    return W, H, gradW, gradH, BppState(
        Wt=Wt, WtW=WtW, WtA=WtA, pivot_rounds=rounds + r_h + r_w
    ), ok
