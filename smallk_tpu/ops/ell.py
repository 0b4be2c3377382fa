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


def _build_buckets(indptr, indices, data, minor_dim, min_len=8,
                   pad_multiple=1):
    """Group the major-axis slices of a CS{C,R} structure by pow-2 length.

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

    # bucket id = pow-2 class of the slice length (vectorized)
    classes = np.maximum(
        np.ceil(np.log2(np.maximum(lengths, 1))).astype(np.int64),
        int(np.log2(min_len)),
    )
    out = []
    inv = np.empty(n_major, dtype=np.int32)
    offset = 0
    for cls in np.unique(classes):
        L = 1 << int(cls)
        ids = np.where(classes == cls)[0].astype(np.int32)
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


# Docs per row-bucket block for very wide matrices.  The AH' product
# gathers rows of the (n, k) H-transpose table; measured on v5e
# (scripts/tpu_batch18.py), the segmented gather-product runs at
# ~176-199 GB/s when the table is <= ~34 MB but collapses to ~46 GB/s
# once it exceeds ~100 MB (locality, not fusion — identical nnz count).
# Partitioning the docs into 64k-wide blocks keeps every gather inside
# a small table slice (at k=128 f32: 33 MB) and recovers the fast rate
# at the cost of one (m, k) partial-sum per block.
_DOC_BLOCK = 65536


@jax.tree_util.register_pytree_node_class
class EllAOp:
    """Sparse operand in dual bucketed-ELL form (by columns and by rows).

    For matrices wider than 2x `_DOC_BLOCK` docs the row-major family is
    built PER DOC BLOCK (`row_blocks`): mm_nt then gathers each block's
    nonzeros from only that block's H-transpose slice and accumulates
    the (m, k) partials — the TPU-native counterpart of the reference's
    cache-blocked sparse GEMM threading (sparse_gemm_ab_impl.hpp)."""

    def __init__(self, shape, col_inv, col_buckets, row_inv, row_buckets,
                 row_blocks=None, row_block_size=0):
        self._shape = tuple(int(s) for s in shape)
        self.col_inv = col_inv          # (n,) inverse permutation
        self.col_buckets = col_buckets  # list of (idx(g,L), vals(g,L))
        self.row_inv = row_inv          # (m,) — None when doc-blocked
        self.row_buckets = row_buckets
        self.row_blocks = row_blocks    # list of (inv(m,), buckets) or None
        self.row_block_size = int(row_block_size)

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32, min_len=8, pad_multiple=1,
                   doc_block="auto"):
        """`pad_multiple`: pad bucket majors to this multiple (set to the
        mesh axis size, or its lcm, for sharded runs — see
        parallel.mesh.shard_operand).  `doc_block`: docs per row-bucket
        block ("auto": `_DOC_BLOCK` when n >= 2x that, else monolithic;
        None/0 forces monolithic)."""
        csc = A.tocsc()
        csc.sort_indices()
        m, n = csc.shape
        col_inv, cb = _build_buckets(
            csc.indptr, csc.indices, csc.data, m, min_len, pad_multiple
        )
        if doc_block == "auto":
            doc_block = _DOC_BLOCK if n >= 2 * _DOC_BLOCK else 0

        def dev(bkts):
            return [
                (jnp.asarray(idx), jnp.asarray(vals, dtype=dtype))
                for (_ids, idx, vals) in bkts
            ]

        row_inv = row_bk = blocks = None
        if doc_block:
            blocks = []
            for b0 in range(0, n, int(doc_block)):
                b1 = min(n, b0 + int(doc_block))
                # CSC column slices are indptr arithmetic (O(nnz_block));
                # per-slab tocsr gives block-local column indices
                slab = csc[:, b0:b1].tocsr()
                slab.sort_indices()
                inv_b, rb_b = _build_buckets(
                    slab.indptr, slab.indices, slab.data, b1 - b0,
                    min_len, pad_multiple,
                )
                blocks.append((jnp.asarray(inv_b), dev(rb_b)))
        else:
            csr = A.tocsr()
            csr.sort_indices()
            row_inv, rb = _build_buckets(
                csr.indptr, csr.indices, csr.data, n, min_len, pad_multiple
            )
            row_inv, row_bk = jnp.asarray(row_inv), dev(rb)

        return cls(
            (m, n),
            jnp.asarray(col_inv),
            dev(cb),
            row_inv,
            row_bk,
            row_blocks=blocks,
            row_block_size=int(doc_block or 0),
        )

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        if self.col_buckets:
            return self.col_buckets[0][1].dtype
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
            return jnp.einsum(
                "gl,glk->gk", vals_b, gb,
                precision=_PRECISION,
                preferred_element_type=_pet(vals_b),
            ).astype(out_dtype)

        if g_total * L * k * elem <= cls._GATHER_BYTES_BUDGET:
            return block(idx, vals)

        chunk = max(256, cls._GATHER_BYTES_BUDGET // (L * k * elem))
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

    def mm_tn(self, W):
        """W^T A -> (k, n): per column j, sum of vals * W[row]."""
        table = jnp.concatenate(
            [W, jnp.zeros((1, W.shape[1]), W.dtype)], axis=0
        )
        return self._product(self.col_buckets, self.col_inv, table).T

    def mm_nt(self, H):
        """A H^T -> (m, k): per row i, sum of vals * H[:, col]."""
        if self.row_blocks is None:
            table = jnp.concatenate(
                [H.T, jnp.zeros((1, H.shape[0]), H.dtype)], axis=0
            )
            return self._product(self.row_buckets, self.row_inv, table)
        # doc-blocked: gather each block's nonzeros from only its slice
        # of the H-transpose table (static slice bounds — one compile),
        # then accumulate the (m, k) partials.  Partials stay in the
        # f32/f64 accumulator dtype and are rounded ONCE at the end, so
        # a bf16 operand sees the same single rounding as the monolithic
        # path rather than one per block.
        HT = H.T
        zero = jnp.zeros((1, H.shape[0]), H.dtype)
        acc = _pet(self.col_buckets[0][1]) if self.col_buckets else HT.dtype
        out = None
        b0 = 0
        for inv_b, rb_b in self.row_blocks:
            b1 = min(b0 + self.row_block_size, self._shape[1])
            tab = jnp.concatenate([HT[b0:b1], zero], axis=0)
            part = self._product(rb_b, inv_b, tab, out_dtype=acc)
            out = part if out is None else out + part
            b0 = b1
        return out.astype(self.dtype)

    def col_sums(self):
        ones = jnp.ones((self._shape[0], 1), self.dtype)
        return self.mm_tn(ones)[0, :]

    def tree_flatten(self):
        flat_cols = [t for pair in self.col_buckets for t in pair]
        if self.row_blocks is None:
            flat_rows = [t for pair in self.row_buckets for t in pair]
            children = (self.col_inv, self.row_inv, *flat_cols, *flat_rows)
            aux = (self._shape, len(self.col_buckets),
                   len(self.row_buckets), None, 0)
            return children, aux
        flat_blocks, counts = [], []
        for inv_b, rb_b in self.row_blocks:
            flat_blocks.append(inv_b)
            flat_blocks.extend(t for pair in rb_b for t in pair)
            counts.append(len(rb_b))
        children = (self.col_inv, *flat_cols, *flat_blocks)
        aux = (self._shape, len(self.col_buckets), 0, tuple(counts),
               self.row_block_size)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, n_cb, n_rb, block_counts, block_size = aux
        if block_counts is None:
            col_inv, row_inv = children[0], children[1]
            rest = children[2:]
            cb = [(rest[2 * i], rest[2 * i + 1]) for i in range(n_cb)]
            off = 2 * n_cb
            rb = [
                (rest[off + 2 * i], rest[off + 2 * i + 1])
                for i in range(n_rb)
            ]
            return cls(shape, col_inv, cb, row_inv, rb)
        col_inv = children[0]
        rest = children[1:]
        cb = [(rest[2 * i], rest[2 * i + 1]) for i in range(n_cb)]
        off = 2 * n_cb
        blocks = []
        for cnt in block_counts:
            inv_b = rest[off]
            off += 1
            rb_b = [
                (rest[off + 2 * i], rest[off + 2 * i + 1])
                for i in range(cnt)
            ]
            off += 2 * cnt
            blocks.append((inv_b, rb_b))
        return cls(shape, col_inv, cb, None, None,
                   row_blocks=blocks, row_block_size=block_size)
