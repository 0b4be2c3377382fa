"""Chunk-expanded column table: static-shape sparse column-subset gathers.

Reference: `SparseMatrix<T>::SubMatrixColsCompact`
(sparse_matrix_impl.hpp:479) — hierclust extracts a compacted CSC
submatrix per tree node (clust_hier_generic.hpp:424), so per-node cost
scales with the subset's nonzeros.  Dynamic-shape extraction defeats
XLA, so the TPU-native equivalent splits every column into fixed-length
chunks of `L0` nonzeros at build time (the last chunk zero-padded).
Any column subset then becomes a STATIC-shape gather of chunk rows:

  - the subset's chunk count is bucketed to a compiled ladder exactly
    like hierclust buckets doc counts;
  - `W'A_sub` is a per-chunk contraction + a segment-sum onto local
    doc slots (MXU/VPU work over (wc, L0) tiles);
  - `A_sub H'` is a scatter-add of per-chunk outer products onto the
    term axis.

Per-iteration product cost on the gathered operand is O(wc * L0)
~ O(nnz_subset) — the reference's compact-submatrix scaling with no
dynamic shapes and no host round trips.  Intra-chunk padding wastes at
most L0/2 entries per column on average; `from_scipy` picks L0 near the
median column length (clamped to a lane-friendly [8, 256]) so the
expected waste stays tens of percent, like the bucketed ELL itself.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .dense import _PRECISION, _pet


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


class CscChunks:
    """Host+device chunk table of a scipy sparse matrix (columns)."""

    def __init__(self, shape, L0, rows, vals, chunk_doc, cnt, starts):
        self.shape = tuple(int(s) for s in shape)
        self.L0 = int(L0)
        self.rows = rows            # (C+1, L0) int32, sentinel m on pads
        self.vals = vals            # (C+1, L0), 0 on pads; row C all-pad
        self.chunk_doc = chunk_doc  # (C+1,) int32, row C -> sentinel n
        self.cnt = cnt              # host (n,) int32 chunks per column
        self.starts = starts        # host (n+1,) int64 chunk offsets
        self.C = int(chunk_doc.shape[0]) - 1

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32, L0=None):
        import scipy.sparse as sp

        csc = A.tocsc() if not sp.isspmatrix_csc(A) else A
        csc.sort_indices()
        m, n = csc.shape
        lens = np.diff(csc.indptr)
        if L0 is None:
            med = int(np.median(lens[lens > 0])) if (lens > 0).any() else 8
            L0 = min(256, max(8, _next_pow2(med)))
        L0 = int(L0)
        cnt = -(-lens // L0)  # ceil; 0 chunks for empty columns
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cnt, out=starts[1:])
        C = int(starts[-1])

        rows = np.full((C + 1, L0), m, dtype=np.int32)
        vals = np.zeros((C + 1, L0), dtype=np.float64)
        chunk_doc = np.full(C + 1, n, dtype=np.int32)
        # vectorized fill: entry e of column j lands in chunk
        # starts[j] + e//L0, lane e%L0
        col_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        within = np.arange(csc.nnz, dtype=np.int64) - np.repeat(
            csc.indptr[:-1].astype(np.int64), lens)
        chunk_ids = starts[col_of] + (within // L0)
        lanes = within % L0
        rows[chunk_ids, lanes] = csc.indices
        vals[chunk_ids, lanes] = csc.data
        chunk_doc[:C] = np.repeat(np.arange(n, dtype=np.int32), cnt)

        return cls(
            (m, n), L0,
            jnp.asarray(rows),
            jnp.asarray(vals.astype(jnp.dtype(dtype))),
            jnp.asarray(chunk_doc),
            cnt.astype(np.int32), starts,
        )

    # --- host-side subset planning (sequential engine) -----------------

    def subset_chunk_count(self, subset) -> int:
        return int(self.cnt[np.asarray(subset)].sum())

    def gather_host(self, subset, wc: int):
        """Host-computed gather plan for a doc subset, padded to wc
        chunks / wc doc slots.  The subset's given order is preserved
        (doc slot i = subset[i], matching the dense gather path's
        column order so split labels line up).  Returns np
        (idx_docs, idx_chunks, slot) ready to ship as device scalars."""
        subset = np.asarray(subset, dtype=np.int64)
        if len(subset) > wc:
            raise ValueError("gather_host: wc too small for subset docs")
        docs_sorted = subset
        idx_docs = np.full(wc, self.shape[1], dtype=np.int32)
        idx_docs[: len(subset)] = docs_sorted
        reps = self.cnt[docs_sorted]
        total = int(reps.sum())
        if total > wc:
            raise ValueError("gather_host: wc too small for subset")
        idx_chunks = np.full(wc, self.C, dtype=np.int32)
        slot = np.full(wc, wc, dtype=np.int32)
        base = np.repeat(self.starts[docs_sorted], reps)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
        idx_chunks[:total] = (base + offs).astype(np.int32)
        slot[:total] = np.repeat(
            np.arange(len(subset), dtype=np.int32), reps)
        return idx_docs, idx_chunks, slot

    # --- device-side subset planning (chain) ---------------------------

    def gather_device(self, mask_docs, wc: int):
        """Inside-jit gather plan from a (n,) boolean doc mask.

        idx_docs ascending (sentinel n), idx_chunks ascending (sentinel
        C), slot = position of each chunk's doc within idx_docs
        (pads -> wc).  Exact when the subset fits in wc chunks; callers
        gate on the chunk count (see subset sizes in the chain step)."""
        n = self.shape[1]
        maskc = jnp.concatenate(
            [mask_docs, jnp.zeros((1,), jnp.bool_)])[self.chunk_doc]
        maskc = maskc.at[self.C].set(False)
        idx_docs = jnp.nonzero(
            mask_docs, size=wc, fill_value=n)[0].astype(jnp.int32)
        idx_chunks = jnp.nonzero(
            maskc, size=wc, fill_value=self.C)[0].astype(jnp.int32)
        cdocs = self.chunk_doc[idx_chunks]
        slot = jnp.searchsorted(idx_docs, cdocs).astype(jnp.int32)
        slot = jnp.where(cdocs >= n, wc, slot)
        return idx_docs, idx_chunks, slot

    def gathered(self, idx_chunks, slot, wc: int):
        """Build the (wc, L0) gathered operand (device)."""
        rows = jnp.take(self.rows, idx_chunks, axis=0)
        vals = jnp.take(self.vals, idx_chunks, axis=0)
        return GatheredColsAOp(rows, vals, slot, self.shape[0], wc)

    def tree_flatten(self):
        return ((self.rows, self.vals, self.chunk_doc),
                (self.shape, self.L0, self.cnt.tobytes(),
                 self.starts.tobytes()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, L0, cnt_b, starts_b = aux
        rows, vals, chunk_doc = children
        return cls(shape, L0, rows, vals, chunk_doc,
                   np.frombuffer(cnt_b, dtype=np.int32),
                   np.frombuffer(starts_b, dtype=np.int64))


jax.tree_util.register_pytree_node_class(CscChunks)


@jax.tree_util.register_pytree_node_class
class GatheredColsAOp:
    """Column-subset operand: `rows`/`vals` (wc, L0) chunk tiles with
    `slot` (wc,) mapping each chunk to its local doc column in
    [0, wc) (pads -> wc).  Column j of the logical (m, wc) operand is
    the sum of its chunks; pad columns are exactly zero — the same
    zero-pad-column contract as the dense bucketed gather
    (hierclust._Rank2Runner docstring)."""

    def __init__(self, rows, vals, slot, m, wc, row_perm=None,
                 sorted_rows=None):
        self.rows = rows
        self.vals = vals
        self.slot = slot
        self.m = int(m)
        self.wc = int(wc)
        # Row-sort permutation, computed ONCE per gathered operand
        # (loop-invariant: XLA hoists it out of the solve while_loop).
        # mm_nt's term-axis reduction then runs as a gather + SORTED
        # segment-sum instead of a scatter-add — an unsorted TPU
        # scatter-add over millions of duplicate targets is the
        # dominant cost of the naive formulation (measured: the chunk
        # path LOST to full-width masked products at 250k docs).
        if row_perm is None:
            flat = rows.reshape(-1)
            row_perm = jnp.argsort(flat)
            sorted_rows = jnp.take(flat, row_perm)
        self._row_perm = row_perm
        self._sorted_rows = sorted_rows

    @property
    def shape(self):
        return (self.m, self.wc)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def padded_nnz(self):
        """Padded gathered entries per product (dispatch-budget model)."""
        return int(self.vals.shape[0]) * int(self.vals.shape[1])

    @staticmethod
    def _res_dtype(factor):
        """Factor-dtype product contract (see ops/ell._res_dtype): the
        storage dtype must not round W'A / AH' below compute
        precision."""
        if jnp.dtype(factor.dtype).itemsize == 1:
            return jnp.bfloat16
        return jnp.dtype(factor.dtype)

    def _cast(self, x):
        if jnp.dtype(x.dtype).itemsize == 1:
            return x.astype(jnp.bfloat16)
        return x

    def mm_tn(self, W):
        """W^T A_sub -> (k, wc)."""
        res = self._res_dtype(W)
        k = W.shape[1]
        Wx = jnp.concatenate(
            [W, jnp.zeros((1, k), W.dtype)], axis=0)  # sentinel row m
        g = jnp.take(Wx, self.rows.reshape(-1), axis=0).reshape(
            self.rows.shape[0], self.rows.shape[1], k)
        c = jnp.einsum(
            "cl,clk->ck", self._cast(self.vals), self._cast(g),
            precision=_PRECISION, preferred_element_type=_pet(W),
        )  # (wc_chunks, k) per-chunk partials
        out = jax.ops.segment_sum(
            c, self.slot, num_segments=self.wc + 1,
            indices_are_sorted=True,
        )[: self.wc]
        return out.T.astype(res)

    def mm_nt(self, H):
        """A_sub H^T -> (m, k) for H (k, wc)."""
        res = self._res_dtype(H)
        k = H.shape[0]
        Ht = jnp.concatenate(
            [H.T, jnp.zeros((1, k), H.dtype)], axis=0)  # pad slot wc
        h = jnp.take(Ht, self.slot, axis=0)  # (wc_chunks, k)
        acc = _pet(H)
        contrib = (self._cast(self.vals)[:, :, None].astype(acc)
                   * self._cast(h)[:, None, :].astype(acc))
        # gather by the precomputed row-sort permutation, then a sorted
        # segment-sum (see __init__) — never an unsorted scatter-add
        srt = jnp.take(contrib.reshape(-1, k), self._row_perm, axis=0)
        out = jax.ops.segment_sum(
            srt, self._sorted_rows, num_segments=self.m + 1,
            indices_are_sorted=True,
        )
        return out[: self.m].astype(res)

    def col_sums(self):
        ones = jnp.ones((self.m, 1), self.vals.dtype)
        return self.mm_tn(ones)[0, :]

    def tree_flatten(self):
        return ((self.rows, self.vals, self.slot, self._row_perm,
                 self._sorted_rows), (self.m, self.wc))

    @classmethod
    def tree_unflatten(cls, aux, children):
        rows, vals, slot, row_perm, sorted_rows = children
        return cls(rows, vals, slot, *aux, row_perm=row_perm,
                   sorted_rows=sorted_rows)
