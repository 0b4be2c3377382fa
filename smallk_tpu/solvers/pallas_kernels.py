"""Pallas TPU kernels for the NNLS hot path.

The BPP inner solver factors every column's masked k x k SPD system each
pivot round (solvers/nnls.py).  The XLA formulation materializes the
(k, k+1, n) augmented tensor in HBM between elimination steps — at k=128,
reuters width, that is ~8 GB of HBM traffic per solve.  This kernel runs
the whole statically-unrolled Gauss-Jordan elimination on a VMEM-resident
column tile, so HBM traffic drops to the inputs (LHS, RHS, passive) and
the output X — about k+2 vectors per column instead of ~k^2.

The augmented system lives in an explicit VMEM *scratch ref* and every
elimination step updates it IN PLACE: a functional formulation keeps ~10
copies of M live across the unrolled steps (measured: 19.7 MB scoped vmem
at k=32, tile=512 -> compile-time OOM), while the scratch form needs one.

Reference semantics: BppSolveNormalEqNoGroup (nmf_solver_bpp.hpp:146-219)
— per-column masked SPD solve; see solvers/nnls.py for the masked-M
equivalence proof and the dead-pivot guard rationale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512
# Scoped-vmem headroom (hard cap 16 MB).  Mosaic's measured working set is
# ~1.85x the (k, k, T) scratch (double-buffered stores + temps): k=128,
# tile=128 allocated 16.34 MB.  7 MB of modeled bytes keeps the real usage
# near half the cap.
_VMEM_BUDGET = 7 * 1024 * 1024


_ROW_CHUNK = 32  # rows of M updated per in-place store (bounds temps)


def _pick_tile(k: int, n: int) -> int:
    """Largest power-of-2 tile whose scratch + temps fit the VMEM budget.

    Mosaic requires the lane (minor) block dim to be a multiple of 128,
    so the result is always one of {512, 256, 128} and callers pad n up
    to a tile multiple (starting from n instead would produce illegal
    non-128-multiple tiles whenever 128 < n < 512 — e.g. n=200 under a
    tight budget halved to 100 and failed Mosaic compilation).
    """
    tile = _TILE
    # scratch M (k, k, T) + row-chunk temp + ~6 live (k, T) temps
    while tile > 128 and (
        (k * k + _ROW_CHUNK * k + 8 * k) * tile * 4 > _VMEM_BUDGET
    ):
        tile //= 2
    return tile


def _gj_kernel(LHS_ref, RHS_ref, p_ref, X_ref, M_ref, *, k: int):
    """Masked GJ on one (k, tile) column block; M_ref is VMEM scratch.

    Pallas TPU cannot lower scatter updates; everything below is built
    from dynamic slices, broadcasts and selects only.  The pivot loop is
    a lax.fori_loop (NOT a Python unroll: Mosaic compile time for a
    128-copy unrolled body runs to many minutes; the rolled loop
    compiles in seconds and the elimination is VPU-bound either way).
    """
    p = p_ref[:]  # (k, T) 0/1 in value dtype
    LHS = LHS_ref[:]  # (k, k)
    eye = jnp.eye(k, dtype=LHS.dtype)

    # masked M in (k, k, T) layout: batch along lanes.  Initialized in row
    # blocks — a whole-tensor expression would materialize a second
    # (k, k, T) temp beside the scratch and blow the 16 MB scoped-vmem cap
    # (measured: 16.34 MB at k=128, T=128).
    one_m_p = 1.0 - p
    for r0 in range(0, k, _ROW_CHUNK):
        sz = min(k, r0 + _ROW_CHUNK) - r0
        LHS_b = jax.lax.slice_in_dim(LHS, r0, r0 + sz, axis=0)
        p_b = jax.lax.slice_in_dim(p, r0, r0 + sz, axis=0)
        eye_b = jax.lax.slice_in_dim(eye, r0, r0 + sz, axis=0)
        omp_b = jax.lax.slice_in_dim(one_m_p, r0, r0 + sz, axis=0)
        M_ref[pl.ds(r0, sz)] = LHS_b[:, :, None] * (
            p[None, :, :] * p_b[:, None, :]
        ) + eye_b[:, :, None] * omp_b[:, None, :]
    X_ref[:] = RHS_ref[:] * p  # x lives in the output ref (k, T)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)  # (k, 1)
    # dead-pivot guard (see solvers/nnls._masked_cholesky_solve)
    tiny = k * jnp.finfo(LHS.dtype).eps * (jnp.max(jnp.abs(LHS)) + 1.0)

    def body(j, _):
        Mj = M_ref[pl.ds(j, 1)][0]  # (k, T): pivot row j
        col_sel = M_ref[:, pl.ds(j, 1), :][:, 0, :]  # (k, T): pivot col j
        # piv[t] = M[j, j, t]: mask-reduce over the already-loaded column
        # (Mosaic has no value-level dynamic_slice)
        piv = jnp.sum(jnp.where(row_ids == j, col_sel, 0.0), axis=0)
        safe = jnp.abs(piv) > tiny
        inv = jnp.where(safe, 1.0 / jnp.where(safe, piv, 1.0), 0.0)
        row_j = Mj * inv[None, :]  # (k, T); unit row when unsafe
        row_j = jnp.where(
            safe[None, :], row_j,
            jnp.where(row_ids == j, 1.0, 0.0),
        )
        xj = X_ref[pl.ds(j, 1)][0] * inv  # (T,); 0 when unsafe
        f = jnp.where(row_ids == j, 0.0, col_sel)
        f = jnp.where(safe[None, :], f, 0.0)
        # update M in row blocks: a whole-tensor expression would
        # materialize a second (k, k, T) temp and double the VMEM bill.
        # lax.slice_in_dim / pl.ds only — jnp value indexing that mixes a
        # slice with newaxis lowers to a gather Mosaic cannot handle.
        for r0 in range(0, k, _ROW_CHUNK):
            sz = min(k, r0 + _ROW_CHUNK) - r0
            fa = jax.lax.slice_in_dim(f, r0, r0 + sz, axis=0)
            M_ref[pl.ds(r0, sz)] = (
                M_ref[pl.ds(r0, sz)] - fa[:, None, :] * row_j[None, :, :]
            )
        X_ref[:] = X_ref[:] - f * xj[None, :]
        M_ref[pl.ds(j, 1)] = row_j[None]
        X_ref[pl.ds(j, 1)] = xj[None]
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_gj_solve_pallas(LHS, RHS, passive, interpret: bool = False):
    """Pallas version of solvers.nnls's masked solve.

    LHS: (k, k), RHS: (k, n), passive: (k, n) bool -> X (k, n).
    `interpret=True` runs the kernel in Pallas interpreter mode (any
    backend) for parity testing.
    """
    k, n = RHS.shape
    dtype = LHS.dtype
    tile = _pick_tile(k, n)
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
        scratch_shapes=[pltpu.VMEM((k, k, tile), dtype)],
        interpret=interpret,
    )(LHS, RHS, p)
    return out[:, :n]
