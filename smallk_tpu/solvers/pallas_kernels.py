"""Pallas TPU kernels for the NNLS hot path.

The BPP inner solver factors every column's masked k x k SPD system each
pivot round (solvers/nnls.py).  The XLA formulation materializes the
(k, k+1, n) augmented tensor in HBM between elimination steps; this Pallas
kernel runs the whole statically-unrolled Gauss-Jordan elimination on a
VMEM-resident column tile, so HBM traffic drops to the inputs (LHS, RHS,
passive) and the output X — about k+2 vectors instead of ~k^2.

Reference semantics: BppSolveNormalEqNoGroup (nmf_solver_bpp.hpp:146-219)
— per-column masked SPD solve; see solvers/nnls.py for the masked-M
equivalence proof.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512


def _gj_kernel(LHS_ref, RHS_ref, p_ref, X_ref, *, k: int):
    # Pallas TPU cannot lower scatter updates; everything below is built
    # from slices, broadcasts and selects only.
    p = p_ref[:]  # (k, T) 0/1 in value dtype
    LHS = LHS_ref[:]  # (k, k)
    eye = jnp.eye(k, dtype=LHS.dtype)

    # masked M in (k, k, T) layout: batch along lanes
    M = LHS[:, :, None] * (p[None, :, :] * p[:, None, :]) + (
        eye[:, :, None] * (1.0 - p)[:, None, :]
    )
    x = RHS_ref[:] * p  # (k, T)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)  # (k, 1)
    # dead-pivot guard (see solvers/nnls._masked_cholesky_solve)
    tiny = k * jnp.finfo(LHS.dtype).eps * (jnp.max(jnp.abs(LHS)) + 1.0)

    # unrolled Gauss-Jordan over the k pivots; work arrays stay in VMEM
    for j in range(k):
        piv = M[j, j, :]  # (T,)
        safe = jnp.abs(piv) > tiny
        inv = jnp.where(safe, 1.0 / jnp.where(safe, piv, 1.0), 0.0)
        row_j = M[j] * inv[None, :]  # (k, T); zero row when unsafe
        row_j = jnp.where(
            safe[None, :], row_j,
            jnp.where(row_ids == j, 1.0, 0.0),
        )
        xj = x[j, :] * inv  # (T,); 0 when unsafe
        f = jnp.where(row_ids == j, 0.0, M[:, j, :])  # (k, T), 0 at row j
        f = jnp.where(safe[None, :], f, 0.0)
        M = M - f[:, None, :] * row_j[None, :, :]
        x = x - f * xj[None, :]
        is_j = row_ids == j
        M = jnp.where(is_j[:, :, None], row_j[None, :, :], M)
        x = jnp.where(is_j, xj[None, :], x)

    X_ref[:] = x


@functools.partial(jax.jit, static_argnames=())
def masked_gj_solve_pallas(LHS, RHS, passive):
    """Pallas version of solvers.nnls._masked_cholesky_solve.

    LHS: (k, k), RHS: (k, n), passive: (k, n) bool -> X (k, n).
    n must be padded to a multiple of the tile by the caller (the solver
    shapes are padded at operand construction).
    """
    k, n = RHS.shape
    dtype = LHS.dtype
    tile = min(_TILE, n)
    if n % tile != 0:
        pad = tile - n % tile
        RHS = jnp.pad(RHS, ((0, 0), (0, pad)))
        passive = jnp.pad(passive, ((0, 0), (0, pad)))
    n_pad = RHS.shape[1]
    p = passive.astype(dtype)

    out = pl.pallas_call(
        functools.partial(_gj_kernel, k=k),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad), dtype),
    )(LHS, RHS, p)
    return out[:, :n]
