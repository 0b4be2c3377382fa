"""A-operand abstraction: the dense/sparse split, resolved once.

The reference templates every solver on the matrix type of A
(common/include/nmf_solve_generic.hpp:30-34), so one solver body serves dense
and sparse A.  The TPU-native equivalent: solvers receive an *operand* object
exposing exactly the two products they need,

    mm_tn(W) = W^T A   (k x n)
    mm_nt(H) = A H^T   (m x k)

with three implementations:
  - DenseAOp:  A materialized (m, n) on device; products ride the MXU.
  - SparseAOp: COO/segment-sum products for matrices too large to densify
    (reference's threaded CSC SpMM, sparse_gemm_{ab,ba}_impl.hpp, becomes
    XLA gather + segment-sum; a Pallas kernel backs the hot path).
  - MaskedAOp: column-masked view used by hierclust node subsets; masking
    commutes with both products so A is never re-materialized
    (replaces SubMatrixColsCompact, sparse_matrix_impl.hpp:479).

All are registered pytrees so they pass transparently through jit/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dense import _PRECISION, _pet


@jax.tree_util.register_pytree_node_class
class DenseAOp:
    """Dense operand: A stored as an (m, n) device array."""

    def __init__(self, A):
        self.A = A

    @property
    def shape(self):
        return self.A.shape

    @property
    def dtype(self):
        return self.A.dtype

    def mm_tn(self, W):
        return jnp.matmul(
            W.T, self.A, precision=_PRECISION, preferred_element_type=_pet(W)
        ).astype(W.dtype)

    def mm_nt(self, H):
        return jnp.matmul(
            self.A, H.T, precision=_PRECISION, preferred_element_type=_pet(H)
        ).astype(H.dtype)

    # Transposed-factor forms for the rank-2 Wt (k, m) layout (see
    # solvers/rank2 step_t): a (m, 2) array lives lane-padded to
    # (m, 128) tiles on TPU — 64x its logical footprint — so the rank-2
    # solver carries W transposed and the products produce/consume the
    # (k, m) orientation directly, no padded intermediates.
    def mm_tn_t(self, Wt):
        """Wt A -> (k, n) for Wt (k, m)."""
        return jnp.matmul(
            Wt, self.A, precision=_PRECISION,
            preferred_element_type=_pet(Wt)
        ).astype(Wt.dtype)

    def mm_nt_t(self, H):
        """(A H^T)^T = H A^T -> (k, m), contracted directly."""
        return jax.lax.dot_general(
            H, self.A, (((1,), (1,)), ((), ())),
            precision=_PRECISION, preferred_element_type=_pet(H),
        ).astype(H.dtype)

    def col_sums(self):
        return jnp.sum(self.A, axis=0)

    def tree_flatten(self):
        return (self.A,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@jax.tree_util.register_pytree_node_class
class SparseAOp:
    """Sparse operand in dual-sorted COO form.

    Stores the nonzeros twice, sorted by column and by row, so both products
    reduce to a gather + sorted segment-sum (fast on TPU):

      mm_tn: (W^T A)[:, j] = sum_{nz in col j} val * W[row, :]
      mm_nt: (A H^T)[i, :] = sum_{nz in row i} val * H[:, col]

    Use `SparseAOp.from_scipy` to build from a host CSC matrix.
    """

    def __init__(self, shape, c_rows, c_cols, c_vals, r_rows, r_cols, r_vals):
        self._shape = tuple(int(s) for s in shape)
        self.c_rows = c_rows  # nonzeros sorted by column id
        self.c_cols = c_cols
        self.c_vals = c_vals
        self.r_rows = r_rows  # nonzeros sorted by row id
        self.r_cols = r_cols
        self.r_vals = r_vals

    @classmethod
    def from_scipy(cls, A_csc, dtype=jnp.float32, pad_multiple=1024):
        coo = A_csc.tocoo()
        order_c = np.lexsort((coo.row, coo.col))
        order_r = np.lexsort((coo.col, coo.row))

        # Pad the nonzero lists to a multiple of `pad_multiple` with
        # zero-valued entries at the last row/col id: keeps the lists
        # sorted, contributes nothing to products, and makes the arrays
        # shardable across any mesh axis of <= pad_multiple devices.
        nnz = coo.nnz
        padded = -(-max(nnz, 1) // pad_multiple) * pad_multiple

        def pad(x, fill):
            out = np.full(padded, fill, dtype=x.dtype)
            out[:nnz] = x
            return out

        m, n = A_csc.shape
        return cls(
            A_csc.shape,
            jnp.asarray(pad(coo.row[order_c], m - 1), dtype=jnp.int32),
            jnp.asarray(pad(coo.col[order_c], n - 1), dtype=jnp.int32),
            jnp.asarray(pad(coo.data[order_c], 0), dtype=dtype),
            jnp.asarray(pad(coo.row[order_r], m - 1), dtype=jnp.int32),
            jnp.asarray(pad(coo.col[order_r], n - 1), dtype=jnp.int32),
            jnp.asarray(pad(coo.data[order_r], 0), dtype=dtype),
        )

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.c_vals.dtype

    @property
    def nnz(self):
        return self.c_vals.shape[0]

    def mm_tn(self, W):
        # gather W rows at nz row ids, weight, reduce per column
        gathered = W[self.c_rows, :] * self.c_vals[:, None]  # (nnz, k)
        out = jax.ops.segment_sum(
            gathered, self.c_cols, num_segments=self._shape[1],
            indices_are_sorted=True,
        )  # (n, k)
        return out.T.astype(W.dtype)

    def mm_nt(self, H):
        gathered = H[:, self.r_cols].T * self.r_vals[:, None]  # (nnz, k)
        out = jax.ops.segment_sum(
            gathered, self.r_rows, num_segments=self._shape[0],
            indices_are_sorted=True,
        )  # (m, k)
        return out.astype(H.dtype)

    def col_sums(self):
        return jax.ops.segment_sum(
            self.c_vals, self.c_cols, num_segments=self._shape[1],
            indices_are_sorted=True,
        )

    def tree_flatten(self):
        children = (
            self.c_rows, self.c_cols, self.c_vals,
            self.r_rows, self.r_cols, self.r_vals,
        )
        return children, self._shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, *children)


@jax.tree_util.register_pytree_node_class
class MaskedAOp:
    """Column-masked view of another operand: A' = A * diag(mask).

    Masking commutes with both products, so nothing is re-materialized:
      W^T (A diag(m)) = (W^T A) * m[None, :]
      (A diag(m)) H^T = A (H * m[None, :])^T
    Zero columns behave exactly like removed columns for every solver; zero
    rows of the implied submatrix produce zero rows of W, mirroring the
    reference's row-compaction + back-mapping (clust_hier_generic.hpp:424).
    """

    def __init__(self, base, mask):
        self.base = base
        self.mask = mask  # (n,) in A's dtype (0.0 / 1.0)

    @property
    def shape(self):
        return self.base.shape

    @property
    def dtype(self):
        return self.base.dtype

    def mm_tn(self, W):
        return self.base.mm_tn(W) * self.mask[None, :]

    def mm_nt(self, H):
        return self.base.mm_nt(H * self.mask[None, :])

    def mm_tn_t(self, Wt):
        f = getattr(self.base, "mm_tn_t", None)
        base = f(Wt) if f is not None else self.base.mm_tn(Wt.T)
        return base * self.mask[None, :]

    def mm_nt_t(self, H):
        Hm = H * self.mask[None, :]
        f = getattr(self.base, "mm_nt_t", None)
        return f(Hm) if f is not None else self.base.mm_nt(Hm).T

    def col_sums(self):
        return self.base.col_sums() * self.mask

    def tree_flatten(self):
        return (self.base, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])


def as_aop(A, dtype=jnp.float32, densify_threshold_bytes=2 << 30,
           sparse_format="ell", ell_pad_multiple=1):
    """Build an operand from a host matrix (ndarray or scipy sparse).

    Sparse inputs whose dense form fits under `densify_threshold_bytes` are
    densified: at term-doc sparsity the MXU matmul on the dense form beats
    irregular gathers, and HBM holds it easily.  Larger matrices use the
    bucketed-ELL operand (ops/ell.py; ~2x faster than COO segment-sums on
    TPU) unless sparse_format="coo" is requested (COO shards more simply
    across a mesh).
    """
    import scipy.sparse as sp

    from .ell import EllAOp

    if isinstance(A, (DenseAOp, SparseAOp, MaskedAOp, EllAOp)):
        return A
    if sp.issparse(A):
        m, n = A.shape
        itemsize = jnp.dtype(dtype).itemsize
        if m * n * itemsize <= densify_threshold_bytes:
            # Densify ON DEVICE from the COO triplets: the host->device
            # transfer is proportional to nnz, not m*n (the dense image is
            # built by one scatter-add on the chip; duplicates sum, same
            # as the reference's triplet compression).
            coo = A.tocoo()
            dense = (
                jnp.zeros((m, n), dtype)
                .at[jnp.asarray(coo.row), jnp.asarray(coo.col)]
                .add(jnp.asarray(coo.data, dtype=dtype))
            )
            return DenseAOp(dense)
        if sparse_format == "coo":
            return SparseAOp.from_scipy(A.tocsc(), dtype=dtype)
        # ell_pad_multiple: set to the mesh axis size (or the lcm of both
        # axes) so the bucket arrays divide evenly for sharded runs
        return EllAOp.from_scipy(
            A.tocsc(), dtype=dtype, pad_multiple=ell_pad_multiple
        )
    return DenseAOp(jnp.asarray(np.asarray(A), dtype=dtype))
