"""Bucketed-ELL sparse operand: the TPU-friendly format for matrices too
large to densify.

SURVEY.md §7.1 prescribes a padded-CSR/ELL format for the sparse path.
Scatter-based COO segment-sums (ops/aop.SparseAOp) spend most of their
time in TPU scatter; this operand instead groups columns (and rows, for
the transposed product) into power-of-2 nonzero-length buckets, pads each
bucket to a rectangle, and computes each product as

    gather rows of the dense factor  ->  weighted einsum over the pad dim

which lowers to XLA's contiguous row-gather plus an MXU/VPU contraction —
no scatters anywhere.  Padding waste is bounded by 2x (power-of-2
buckets).  Bucket outputs are reassembled with one inverse-permutation
take instead of scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dense import _PRECISION, _pet


# Quarter-step refinement of the pow-2 bucket ladder: a pow-2 class with
# at least this many slices is split into sub-lengths {5/8, 3/4, 7/8, 1}
# of its pow-2 length.  Pow-2 buckets waste up to 2x gather entries on
# concentrated length distributions (a corpus with ~80 nnz/column pads
# every column to 128 — 1.6x), and the bucket products are
# padded-entry-bound (~0.4 Gnnz/s gather wall in every formulation,
# scripts/tpu_batch32-34), so padding cuts are wall-clock cuts.  The
# population gate keeps small workloads on the coarse ladder (more
# buckets = more dispatches, which costs more than the padding at small
# g); L >= 64 keeps sub-lengths multiples of 8.
_FINE_SPLIT_MIN = 4096


def _target_lengths(lengths, min_len):
    """Padded bucket length per slice: pow-2, quarter-step-refined inside
    populous classes (see _FINE_SPLIT_MIN)."""
    classes = np.maximum(
        np.ceil(np.log2(np.maximum(lengths, 1))).astype(np.int64),
        int(np.log2(min_len)),
    )
    targets = (1 << classes).astype(np.int64)
    uniq, counts = np.unique(classes, return_counts=True)
    for cls, cnt in zip(uniq, counts):
        L = 1 << int(cls)
        if cnt < _FINE_SPLIT_MIN or L < 64:
            continue
        sel = classes == cls
        # len in (L/2, L] -> smallest of {5L/8, 6L/8, 7L/8, L} >= len
        step = L // 8
        targets[sel] = np.minimum(
            (-(-lengths[sel] // step)) * step, L
        ).astype(np.int64)
    return targets


def _build_buckets(indptr, indices, data, minor_dim, min_len=8,
                   pad_multiple=1):
    """Group the major-axis slices of a CS{C,R} structure by padded
    length (pow-2 ladder, quarter-step-refined for populous classes —
    _target_lengths).

    Returns (order, bucket_list) where bucket_list entries are
    (ids, idx, vals): ids (g,) major indices, idx (g, L) minor indices
    padded with `minor_dim` (one-past-the-end sentinel), vals (g, L).
    `order` is the concatenation of all bucket ids.

    `pad_multiple`: pad each bucket's major (g) axis to this multiple with
    all-sentinel rows so the bucket arrays divide evenly over a device
    mesh axis (the pad rows contribute zeros and their outputs are never
    referenced by the inverse permutation).
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    lengths = np.diff(indptr)
    n_major = len(lengths)

    targets = _target_lengths(lengths, min_len)
    out = []
    inv = np.empty(n_major, dtype=np.int32)
    offset = 0
    for L in np.unique(targets):
        L = int(L)
        ids = np.where(targets == L)[0].astype(np.int32)
        g = len(ids)
        g_pad = -(-g // pad_multiple) * pad_multiple
        lens = lengths[ids]
        total = int(lens.sum())
        # flat gather indices into the CSC arrays for all bucket entries
        within = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        flat_src = np.repeat(indptr[ids], lens) + within
        rows_in_bucket = np.repeat(np.arange(g), lens)
        idx = np.full((g_pad, L), minor_dim, dtype=np.int32)
        vals = np.zeros((g_pad, L), dtype=np.float64)
        idx[rows_in_bucket, within] = indices[flat_src]
        vals[rows_in_bucket, within] = data[flat_src]
        out.append((ids, idx, vals))
        # stacked-product position of each real slice in this bucket
        inv[ids] = offset + np.arange(g, dtype=np.int32)
        offset += g_pad
    return inv, out


# Minor-dim entries per bucket block for very large matrices.  Each
# product gathers rows of a dense-factor table — (n, k) H-transpose for
# AH', (m, k) W for W'A; measured on v5e (scripts/tpu_batch18.py), the
# segmented gather-product runs at ~176-199 GB/s when the table is
# small but collapses to ~46 GB/s for very large tables (locality,
# not fusion — identical nnz count).  Partitioning the minor dim into
# blocks keeps every gather inside a bounded table slice and recovers
# the fast rate at the cost of one partial-sum per block.  Block-size
# A/B at the flagship 50k x 1M k=128 shape (scripts/tpu_batch68.py,
# fine bucket ladder, f32 factor tables): 65536 -> 457 ms AH',
# 131072 (67 MB slice) -> 413 ms (fewer per-block bucket dispatches),
# 262144 (134 MB slice) -> 575 ms (locality collapse) — so the knee is
# 131072 for k <= 128 factor tables.  The doc side matters for wide
# term-doc corpora (1M docs); the term side for tall vocabularies and
# for graph clustering where A is a node x node adjacency (m = n =
# millions, BASELINE config 5).
_DOC_BLOCK = 131072


@jax.tree_util.register_pytree_node_class
class EllAOp:
    """Sparse operand in dual bucketed-ELL form (by columns and by rows).

    Past 2x `_DOC_BLOCK` on either axis, that axis's bucket family is
    built PER MINOR BLOCK (`row_blocks` over doc ranges for AH',
    `col_blocks` over term ranges for W'A): the product gathers each
    block's nonzeros from only that block's table slice and accumulates
    the partials — the TPU-native counterpart of the reference's
    cache-blocked sparse GEMM threading (sparse_gemm_ab_impl.hpp)."""

    def __init__(self, shape, col_inv, col_buckets, row_inv, row_buckets,
                 row_blocks=None, row_block_size=0,
                 col_blocks=None, col_block_size=0):
        self._shape = tuple(int(s) for s in shape)
        self.col_inv = col_inv          # (n,) — None when term-blocked
        self.col_buckets = col_buckets  # list of (idx(g,L), vals(g,L))
        self.row_inv = row_inv          # (m,) — None when doc-blocked
        self.row_buckets = row_buckets
        self.row_blocks = row_blocks    # list of (inv(m,), buckets) or None
        self.row_block_size = int(row_block_size)
        self.col_blocks = col_blocks    # list of (inv(n,), buckets) or None
        self.col_block_size = int(col_block_size)

    @property
    def padded_nnz(self):
        """Padded gather-table entries per product (the actual per-product
        gather work including bucket padding) — used by run_nmf's
        dispatch-time budget model."""
        def fam(buckets, blocks):
            if blocks is not None:
                return sum(int(idx.size) for _, bkts in blocks
                           for idx, _ in bkts)
            return sum(int(idx.size) for idx, _ in buckets)

        return max(fam(self.col_buckets, self.col_blocks),
                   fam(self.row_buckets, self.row_blocks))

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32, min_len=8, pad_multiple=1,
                   doc_block="auto", term_block="auto"):
        """`pad_multiple`: pad bucket majors to this multiple (set to the
        mesh axis size, or its lcm, for sharded runs — see
        parallel.mesh.shard_operand).  `doc_block` / `term_block`: minor
        entries per block for the row/col bucket families ("auto":
        `_DOC_BLOCK` when that axis has >= 2x that many entries, else
        monolithic; None/0 forces monolithic)."""
        csc = A.tocsc()
        csc.sort_indices()
        csr = A.tocsr()
        csr.sort_indices()
        m, n = csc.shape
        if doc_block == "auto":
            doc_block = _DOC_BLOCK if n >= 2 * _DOC_BLOCK else 0
        if term_block == "auto":
            term_block = _DOC_BLOCK if m >= 2 * _DOC_BLOCK else 0

        def dev(bkts):
            return [
                (jnp.asarray(idx), jnp.asarray(vals, dtype=dtype))
                for (_ids, idx, vals) in bkts
            ]

        def build_family(major_cs, minor_cs, minor_dim, block):
            """(inv, buckets, blocks): the major-axis bucket family,
            monolithic or split into minor-dim blocks.  `major_cs` is
            the compressed-sparse form whose slices are the major axis
            (CSC for columns, CSR for rows); `minor_cs` the transpose
            form, whose cheap indptr-arithmetic slicing along the minor
            axis feeds the per-block rebuild."""
            if not block:
                inv, bk = _build_buckets(
                    major_cs.indptr, major_cs.indices, major_cs.data,
                    minor_dim, min_len, pad_multiple,
                )
                return jnp.asarray(inv), dev(bk), None
            blocks = []
            for b0 in range(0, minor_dim, int(block)):
                b1 = min(minor_dim, b0 + int(block))
                if minor_cs.format == "csc":
                    slab = minor_cs[:, b0:b1].tocsr()
                else:
                    slab = minor_cs[b0:b1, :].tocsc()
                slab.sort_indices()
                inv_b, bk_b = _build_buckets(
                    slab.indptr, slab.indices, slab.data, b1 - b0,
                    min_len, pad_multiple,
                )
                blocks.append((jnp.asarray(inv_b), dev(bk_b)))
            return None, None, blocks

        col_inv, cb, col_blocks = build_family(csc, csr, m, term_block)
        row_inv, rb, row_blocks = build_family(csr, csc, n, doc_block)

        return cls(
            (m, n),
            col_inv,
            cb,
            row_inv,
            rb,
            row_blocks=row_blocks,
            row_block_size=int(doc_block or 0),
            col_blocks=col_blocks,
            col_block_size=int(term_block or 0),
        )

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        if self.col_buckets:
            return self.col_buckets[0][1].dtype
        if self.col_blocks:
            return self.col_blocks[0][1][0][1].dtype
        return jnp.float32

    # memory budget for one gathered (g, L, k) block; larger buckets are
    # processed in slabs via lax.map (a rank-128 bucket over 200k columns
    # would otherwise materialize ~13 GB)
    _GATHER_BYTES_BUDGET = 256 * 1024 * 1024

    @classmethod
    def _bucket_product(cls, idx, vals, table, out_dtype=None):
        """`out_dtype`: result dtype (default: vals.dtype).  The blocked
        mm_nt passes the f32/f64 accumulator dtype so per-block partials
        are rounded ONCE after cross-block summation, like the
        monolithic path — not once per block."""
        k = table.shape[1]
        g_total, L = idx.shape
        elem = jnp.dtype(vals.dtype).itemsize
        out_dtype = out_dtype or vals.dtype

        def block(idx_b, vals_b):
            gb = jnp.take(table, idx_b.reshape(-1), axis=0)
            gb = gb.reshape(idx_b.shape[0], L, k)
            if jnp.dtype(vals_b.dtype).itemsize == 1:
                # 8-bit floats have no implicit promotion path; upcast
                # explicitly (the MXU consumes bf16 anyway)
                vals_b = vals_b.astype(jnp.bfloat16)
                gb = gb.astype(jnp.bfloat16)
            return jnp.einsum(
                "gl,glk->gk", vals_b, gb,
                precision=_PRECISION,
                preferred_element_type=_pet(vals_b),
            ).astype(out_dtype)

        if g_total * L * k * elem <= cls._GATHER_BYTES_BUDGET:
            return block(idx, vals)

        # no large floor here: with very long bucket rows (high-degree
        # graph nodes, L ~ 64k+) even a few rows exhaust the budget, and
        # a 256-row floor would materialize multi-GB gathers
        chunk = max(1, cls._GATHER_BYTES_BUDGET // (L * k * elem))
        chunk = min(chunk, g_total)
        pad = (-g_total) % chunk
        idx_p = jnp.pad(idx, ((0, pad), (0, 0)),
                        constant_values=table.shape[0] - 1)
        vals_p = jnp.pad(vals, ((0, pad), (0, 0)))
        nb = (g_total + pad) // chunk
        out = jax.lax.map(
            lambda args: block(args[0], args[1]),
            (idx_p.reshape(nb, chunk, L), vals_p.reshape(nb, chunk, L)),
        )
        return out.reshape(nb * chunk, k)[:g_total]

    @classmethod
    def _product(cls, buckets, inv, table, out_dtype=None):
        """Generic bucketed product: for each major slice j,
        out[j, :] = sum_l vals[j, l] * table[idx[j, l], :].

        `table` is the dense factor with one zero row appended (sentinel
        for padding).  Returns (n_major, k).
        """
        pieces = [
            cls._bucket_product(idx, vals, table, out_dtype)
            for idx, vals in buckets
        ]
        stacked = jnp.concatenate(pieces, axis=0)
        return jnp.take(stacked, inv, axis=0)

    def _acc_dtype(self, table):
        """f32/f64 accumulator dtype for blocked partials (matches the
        einsum preferred_element_type so cross-block sums round once)."""
        if jnp.dtype(self.dtype) == jnp.float64:
            return jnp.float64
        return jnp.float32

    @staticmethod
    def _res_dtype(factor):
        """Product result dtype: the FACTOR (compute) dtype — the
        DenseAOp/SparseAOp contract.  Quantized A-storage must not
        round the solvers' W'A / AH' below the compute precision: a
        bf16-rounded RHS biases BPP's f32 gradient sign tests and
        collapses every pivot to the zero solution (the factors zero
        out within an iteration; caught on the bf16-ELL 1M-doc config).
        8-bit factors (never used by the solvers) floor at bf16."""
        if jnp.dtype(factor.dtype).itemsize == 1:
            return jnp.bfloat16
        return jnp.dtype(factor.dtype)

    def mm_tn(self, W):
        """W^T A -> (k, n): per column j, sum of vals * W[row]."""
        res = self._res_dtype(W)
        zero = jnp.zeros((1, W.shape[1]), W.dtype)
        if self.col_blocks is None:
            table = jnp.concatenate([W, zero], axis=0)
            return self._product(self.col_buckets, self.col_inv, table,
                                 out_dtype=res).T
        # term-blocked: gather each block's nonzeros from only its slice
        # of the W table, accumulate the (n, k) partials, round once
        acc = self._acc_dtype(W)
        out = None
        b0 = 0
        for inv_b, cb_b in self.col_blocks:
            b1 = min(b0 + self.col_block_size, self._shape[0])
            tab = jnp.concatenate([W[b0:b1], zero], axis=0)
            part = self._product(cb_b, inv_b, tab, out_dtype=acc)
            out = part if out is None else out + part
            b0 = b1
        return out.astype(res).T

    def mm_nt(self, H):
        """A H^T -> (m, k): per row i, sum of vals * H[:, col]."""
        res = self._res_dtype(H)
        if self.row_blocks is None:
            table = jnp.concatenate(
                [H.T, jnp.zeros((1, H.shape[0]), H.dtype)], axis=0
            )
            return self._product(self.row_buckets, self.row_inv, table,
                                 out_dtype=res)
        # doc-blocked: gather each block's nonzeros from only its slice
        # of the H-transpose table (static slice bounds — one compile),
        # then accumulate the (m, k) partials.  Partials stay in the
        # f32/f64 accumulator dtype and are rounded ONCE at the end, so
        # a bf16 operand sees the same single rounding as the monolithic
        # path rather than one per block.
        HT = H.T
        zero = jnp.zeros((1, H.shape[0]), H.dtype)
        acc = self._acc_dtype(HT)
        out = None
        b0 = 0
        for inv_b, rb_b in self.row_blocks:
            b1 = min(b0 + self.row_block_size, self._shape[1])
            tab = jnp.concatenate([HT[b0:b1], zero], axis=0)
            part = self._product(rb_b, inv_b, tab, out_dtype=acc)
            out = part if out is None else out + part
            b0 = b1
        return out.astype(res)

    def col_sums(self):
        ones = jnp.ones((self._shape[0], 1), self.dtype)
        return self.mm_tn(ones)[0, :]

    @staticmethod
    def _flatten_family(inv, buckets, blocks):
        """(children list, aux): aux is an int bucket count for a
        monolithic family or a tuple of per-block bucket counts."""
        if blocks is None:
            return [inv] + [t for pair in buckets for t in pair], \
                len(buckets)
        out, counts = [], []
        for inv_b, bk_b in blocks:
            out.append(inv_b)
            out.extend(t for pair in bk_b for t in pair)
            counts.append(len(bk_b))
        return out, tuple(counts)

    @staticmethod
    def _unflatten_family(rest, off, aux):
        """Inverse of _flatten_family from children[off:].  Returns
        (inv, buckets, blocks, new offset)."""
        if isinstance(aux, int):
            inv = rest[off]
            off += 1
            bk = [(rest[off + 2 * i], rest[off + 2 * i + 1])
                  for i in range(aux)]
            return inv, bk, None, off + 2 * aux
        blocks = []
        for cnt in aux:
            inv_b = rest[off]
            off += 1
            bk_b = [(rest[off + 2 * i], rest[off + 2 * i + 1])
                    for i in range(cnt)]
            off += 2 * cnt
            blocks.append((inv_b, bk_b))
        return None, None, blocks, off

    def tree_flatten(self):
        col_kids, col_aux = self._flatten_family(
            self.col_inv, self.col_buckets, self.col_blocks
        )
        row_kids, row_aux = self._flatten_family(
            self.row_inv, self.row_buckets, self.row_blocks
        )
        children = (*col_kids, *row_kids)
        aux = (self._shape, col_aux, row_aux,
               self.col_block_size, self.row_block_size)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, col_aux, row_aux, col_bs, row_bs = aux
        col_inv, cb, col_blocks, off = cls._unflatten_family(
            children, 0, col_aux
        )
        row_inv, rb, row_blocks, _ = cls._unflatten_family(
            children, off, row_aux
        )
        return cls(shape, col_inv, cb, row_inv, rb,
                   row_blocks=row_blocks, row_block_size=row_bs,
                   col_blocks=col_blocks, col_block_size=col_bs)
