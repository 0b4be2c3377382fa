"""Pallas TPU kernel: one full HALS step in a single device program.

Reference semantics: common/include/nmf_solver_hals.hpp — UpdateW_Hals
(:66-118, sequential column sweep with zero-column rescue + unit-L2
normalization) then UpdateH_Hals (:26-62, sequential row sweep) — plus
the surrounding Gram/product computations of solvers/hals.step.

Why a kernel: at the reference's flatclust config (256x256, k=16) the
XLA formulation issues ~6 ops per rank-1 sweep step = ~100 dispatched
ops per iteration on arrays this small — latency-bound at ~93 us/iter
(BENCH_r03: 5.0x the reference CPU, below the >=10x bar).  Everything
(A, W, H, Grams) fits VMEM with room to spare, so the whole step —
W sweep, W'W, W'A, H sweep, gradients, HH', AH' — runs as ONE program.

Layout: W rides TRANSPOSED (k, m).  The sweeps update one column of W /
row of H per step via dynamic slices, which Mosaic supports only on the
SUBLANE (second-to-last) axis — in (k, m)/(k, n) layout both sweep
targets are sublane rows.  Diagonal elements (W'W)_rr / (HH')_cc are
extracted with a one-hot lane mask (no value-level dynamic slice in
Mosaic).

The arithmetic is the same sequence of rank-1 updates the XLA path
(solvers/hals.py) runs; parity is pinned by
tests/test_solvers.py::test_hals_pallas_step_parity in interpreter mode
and the TPU smoke suite on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the whole-step kernel: A + ~2 copies of each factor
# and product, comfortably under the 16 MB cap.
_VMEM_BUDGET = 8 * 1024 * 1024


def hals_fits(m: int, n: int, k: int, a_itemsize: int = 4) -> bool:
    a_bytes = m * n * a_itemsize + m * n * 4  # stored + f32 upcast
    fac = 4 * (k * m + k * n) * 4             # W/H + grads (~2x each)
    return a_bytes + fac + 4 * k * k * 4 <= _VMEM_BUDGET


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _hals_step_kernel(A_ref, Wt0_ref, H0_ref, HHt0_ref, AHtT0_ref,
                      Wt_ref, H_ref, gWt_ref, gH_ref, HHt_ref,
                      AHtT_ref, WtW_s, WtA_s, *, k: int):
    A = A_ref[:].astype(jnp.float32)          # (m, n)
    eps = jnp.finfo(jnp.float32).eps
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    Wt_ref[:] = Wt0_ref[:]
    H_ref[:] = H0_ref[:]
    HHt0 = HHt0_ref[:]                         # (k, k)

    def w_body(c, _):
        # column c of W == sublane row c of Wt
        hht_c = HHt0_ref[pl.ds(c, 1), :]       # (1, k) — HH' symmetric
        # (1,k)x(k,m) matvec as a VPU broadcast-reduce: the sweep is a
        # chain of 2k dependent tiny ops — VPU latency beats MXU issue
        whht_c = jnp.sum(hht_c.T * Wt_ref[:], axis=0, keepdims=True)
        cc = jnp.sum(jnp.where(lane_k == c, hht_c, 0.0))
        w_c = Wt_ref[pl.ds(c, 1), :]
        aht_c = AHtT0_ref[pl.ds(c, 1), :]
        w_new = w_c + (aht_c - whht_c) / cc
        w_new = jnp.where(jnp.isnan(w_new) | (w_new < 0), 0.0, w_new)
        all_zero = jnp.all(w_new == 0)
        w_new = jnp.where(all_zero, jnp.full_like(w_new, eps), w_new)
        norm = jnp.sqrt(jnp.sum(jnp.square(w_new)))
        Wt_ref[pl.ds(c, 1), :] = w_new / norm
        return 0

    jax.lax.fori_loop(0, k, w_body, 0)

    Wt = Wt_ref[:]
    # Mosaic has no value-level dynamic_slice: the sweep reads W'W and
    # W'A rows through VMEM scratch refs (pl.ds on refs is supported)
    WtW_s[:] = _dot(Wt, Wt, ((1,), (1,)))     # (k, k)
    WtA_s[:] = _dot(Wt, A, ((1,), (0,)))      # (k, n)

    def h_body(r, _):
        wtw_r = WtW_s[pl.ds(r, 1), :]                            # (1, k)
        wtwh_r = jnp.sum(wtw_r.T * H_ref[:], axis=0, keepdims=True)
        rr = jnp.sum(jnp.where(lane_k == r, wtw_r, 0.0))
        h_r = H_ref[pl.ds(r, 1), :]
        wta_r = WtA_s[pl.ds(r, 1), :]
        h_new = h_r + (wta_r - wtwh_r) / rr
        h_new = jnp.where(jnp.isnan(h_new) | (h_new < 0), 0.0, h_new)
        H_ref[pl.ds(r, 1), :] = h_new
        return 0

    jax.lax.fori_loop(0, k, h_body, 0)

    H = H_ref[:]
    gH_ref[:] = _dot(WtW_s[:], H, ((1,), (0,))) - WtA_s[:]
    HHt = _dot(H, H, ((1,), (1,)))
    AHtT = _dot(H, A, ((1,), (1,)))           # (k, m) == (A H')^T
    HHt_ref[:] = HHt
    AHtT_ref[:] = AHtT
    gWt_ref[:] = _dot(HHt, Wt_ref[:], ((1,), (0,))) - AHtT


@functools.partial(jax.jit, static_argnames=("interpret",))
def hals_step_pallas(A, W, H, HHt, AHt, interpret: bool = False):
    """One full HALS step.  A (m, n) f32/bf16; W (m, k), H (k, n),
    HHt (k, k), AHt (m, k) all f32.  Returns
    (W', H', gradW, gradH, HHt', AHt') exactly like the XLA step body.
    """
    m, k = W.shape
    n = H.shape[1]
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_hals_step_kernel, k=k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, m), f32),  # Wt'
            jax.ShapeDtypeStruct((k, n), f32),  # H'
            jax.ShapeDtypeStruct((k, m), f32),  # gradW^T
            jax.ShapeDtypeStruct((k, n), f32),  # gradH
            jax.ShapeDtypeStruct((k, k), f32),  # HHt'
            jax.ShapeDtypeStruct((k, m), f32),  # (A H')^T
        ),
        scratch_shapes=[
            pltpu.VMEM((k, k), f32),
            pltpu.VMEM((k, n), f32),
        ],
        interpret=interpret,
    )(A, W.T, H, HHt, AHt.T)
    Wt, H2, gWt, gH, HHt2, AHtT = outs
    return Wt.T, H2, gWt.T, gH, HHt2, AHtT.T
