"""Multi-chip sharding for NMF (the reference's 'planned future' that never
shipped — sphinx/source/pages_introduction.rst:78).

Design (SURVEY.md §5.8, MPI-FAUN communication pattern):
  - 2-D mesh over ("terms", "docs") — A's rows (m) and columns (n).
  - A sharded P("terms", "docs"); W row-sharded with A's rows
    P("terms", None); H column-sharded with A's columns P(None, "docs").
  - Each iteration needs exactly: psum of the k x k Grams (W'W, HH'),
    reduce-scatter/psum along the contracted axis of the W'A / AH'
    products, and a scalar psum for the progress metric.  All of these are
    inserted automatically by GSPMD from the input shardings — the solver
    bodies are unchanged.
  - The per-column NNLS subproblems are independent (nmf_solver_bpp.hpp:
    182-216 proves no cross-column coupling), so the H-side solve is
    communication-free under column sharding; the W-side likewise under
    row sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common.options import NmfOptions
from ..ops.aop import DenseAOp, MaskedAOp, SparseAOp


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("terms", "docs"),
    devices=None,
) -> Mesh:
    """Build a 2-D device mesh.  Default: all devices on the 'docs' axis
    (document/column data-parallelism, the wide dimension of term-doc
    matrices), 1 on 'terms'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def nmf_shardings(mesh: Mesh):
    """(a_sharding, w_sharding, h_sharding) for the canonical NMF layout."""
    t, d = mesh.axis_names
    return (
        NamedSharding(mesh, P(t, d)),
        NamedSharding(mesh, P(t, None)),
        NamedSharding(mesh, P(None, d)),
    )


def shard_operand(a_op, mesh: Mesh):
    """Place an A-operand according to the canonical layout."""
    a_sh, _, _ = nmf_shardings(mesh)
    if isinstance(a_op, DenseAOp):
        return DenseAOp(jax.device_put(a_op.A, a_sh))
    if isinstance(a_op, SparseAOp):
        # COO nonzero lists shard along their sort axis: column-sorted
        # triplets with H's columns, row-sorted with W's rows
        t, d = mesh.axis_names
        col_sh = NamedSharding(mesh, P(d))
        row_sh = NamedSharding(mesh, P(t))
        return SparseAOp(
            a_op.shape,
            jax.device_put(a_op.c_rows, col_sh),
            jax.device_put(a_op.c_cols, col_sh),
            jax.device_put(a_op.c_vals, col_sh),
            jax.device_put(a_op.r_rows, row_sh),
            jax.device_put(a_op.r_cols, row_sh),
            jax.device_put(a_op.r_vals, row_sh),
        )
    if isinstance(a_op, MaskedAOp):
        t, d = mesh.axis_names
        return MaskedAOp(
            shard_operand(a_op.base, mesh),
            jax.device_put(a_op.mask, NamedSharding(mesh, P(d))),
        )
    from ..ops.ell import EllAOp

    if isinstance(a_op, EllAOp):
        # Buckets shard along their major (g) axis: column buckets ride
        # the docs axis (their outputs are H-column slices), row buckets
        # the terms axis.  Requires bucket majors padded to the axis size
        # (EllAOp.from_scipy(pad_multiple=...)); the dense factor table
        # gathered inside the product is small (<= max(m, n) x k) and is
        # all-gathered by GSPMD where needed.
        t, d = mesh.axis_names
        nt = mesh.shape[t]
        nd = mesh.shape[d]

        def put_buckets(buckets, axis_name, size):
            out = []
            for idx, vals in buckets:
                if idx.shape[0] % size != 0:
                    raise ValueError(
                        "EllAOp bucket majors are not divisible by the "
                        f"mesh '{axis_name}' axis ({size}); rebuild with "
                        f"EllAOp.from_scipy(..., pad_multiple={size}) or "
                        "as_aop(..., ell_pad_multiple=...)"
                    )
                sh = NamedSharding(mesh, P(axis_name, None))
                out.append(
                    (jax.device_put(idx, sh), jax.device_put(vals, sh))
                )
            return out

        # the inverse permutations are small (one int per row/col) and are
        # consumed by a cross-bucket take: keep them replicated
        rep = NamedSharding(mesh, P())

        def put_family(inv, buckets, blocks, axis_name, size):
            if blocks is None:
                return (jax.device_put(inv, rep),
                        put_buckets(buckets, axis_name, size), None)
            return (None, None, [
                (jax.device_put(inv_b, rep),
                 put_buckets(bk_b, axis_name, size))
                for inv_b, bk_b in blocks
            ])

        col_inv, cb, col_blocks = put_family(
            a_op.col_inv, a_op.col_buckets, a_op.col_blocks, d, nd
        )
        row_inv, rb, row_blocks = put_family(
            a_op.row_inv, a_op.row_buckets, a_op.row_blocks, t, nt
        )
        return EllAOp(
            a_op.shape, col_inv, cb, row_inv, rb,
            row_blocks=row_blocks, row_block_size=a_op.row_block_size,
            col_blocks=col_blocks, col_block_size=a_op.col_block_size,
        )
    raise TypeError(f"unknown operand type {type(a_op)}")


def shard_factors(W, H, mesh: Mesh):
    _, w_sh, h_sh = nmf_shardings(mesh)
    return jax.device_put(W, w_sh), jax.device_put(H, h_sh)


def sharded_nmf_solve(a_op, W0, H0, opts: NmfOptions, mesh: Mesh):
    """Run the NMF solve loop with inputs sharded over `mesh`.

    GSPMD propagates the input shardings through the (unchanged) solver
    bodies, inserting ICI collectives for the Gram psums and contracted
    products.
    """
    from ..solvers.solve import nmf_solve

    a_sharded = shard_operand(a_op, mesh)
    W_s, H_s = shard_factors(W0, H0, mesh)
    return nmf_solve(a_sharded, W_s, H_s, opts)
