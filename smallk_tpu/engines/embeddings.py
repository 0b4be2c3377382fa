"""Factor matrices as embedding tables: export + retrieval utilities.

North-star scope (BASELINE.json): "the factor matrices W (item/author
embeddings) and H (doc/cluster codes) serving as the retrieval-side
sharded embedding tables".  The reference stops at writing w.csv/h.csv;
this module adds the serving-side operations:

  - sharded placement of W/H over a device mesh
  - cosine / dot-product top-k retrieval (docs for a topic, terms for a
    topic, nearest docs for a query vector) on device
  - npz export for downstream services
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def normalize_rows(X, eps=1e-12):
    n = jnp.linalg.norm(X, axis=1, keepdims=True)
    return X / jnp.maximum(n, eps)


class EmbeddingTable:
    """A (count x dim) embedding table with on-device top-k retrieval."""

    def __init__(self, table, mesh=None, shard_axis: str | None = None):
        table = jnp.asarray(table)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = shard_axis or mesh.axis_names[0]
            table = jax.device_put(
                table, NamedSharding(mesh, P(axis, None))
            )
        self.table = table
        self._normed = None

    @property
    def shape(self):
        return self.table.shape

    def _norm_table(self):
        if self._normed is None:
            self._normed = normalize_rows(self.table)
        return self._normed

    def topk_dot(self, queries, k=10):
        """Top-k rows by dot product.  queries: (q, dim) or (dim,)."""
        q = jnp.atleast_2d(jnp.asarray(queries, self.table.dtype))
        scores = jnp.matmul(
            q, self.table.T, preferred_element_type=jnp.float32
        )
        vals, idx = jax.lax.top_k(scores, k)
        return np.asarray(idx), np.asarray(vals)

    def topk_cosine(self, queries, k=10):
        q = normalize_rows(
            jnp.atleast_2d(jnp.asarray(queries, self.table.dtype))
        )
        scores = jnp.matmul(
            q, self._norm_table().T, preferred_element_type=jnp.float32
        )
        vals, idx = jax.lax.top_k(scores, k)
        return np.asarray(idx), np.asarray(vals)


class NmfEmbeddings:
    """Retrieval views over an NMF factorization A ~= W H.

    W (m x k): term/topic table — row i embeds term i in topic space.
    H (k x n): doc codes — column j embeds document j.
    """

    def __init__(self, W, H, mesh=None):
        self.terms = EmbeddingTable(np.asarray(W), mesh)
        self.docs = EmbeddingTable(np.asarray(H).T, mesh)

    def top_docs_for_topic(self, topic: int, k=10):
        """Documents with the largest loading on a topic."""
        kdim = self.docs.shape[1]
        q = np.zeros(kdim, dtype=np.float32)
        q[topic] = 1.0
        idx, vals = self.docs.topk_dot(q, k)
        return idx[0], vals[0]

    def top_terms_for_topic(self, topic: int, k=10):
        kdim = self.terms.shape[1]
        q = np.zeros(kdim, dtype=np.float32)
        q[topic] = 1.0
        idx, vals = self.terms.topk_dot(q, k)
        return idx[0], vals[0]

    def similar_docs(self, doc: int, k=10):
        """Nearest documents in code space (cosine), excluding self."""
        q = np.asarray(self.docs.table[doc])
        idx, vals = self.docs.topk_cosine(q, k + 1)
        keep = idx[0] != doc
        return idx[0][keep][:k], vals[0][keep][:k]

    def embed_query_terms(self, term_weights):
        """Project a sparse term-weight query into topic space: q = wᵀW."""
        w = jnp.asarray(term_weights, self.terms.table.dtype)
        return np.asarray(
            jnp.matmul(w, self.terms.table,
                       preferred_element_type=jnp.float32)
        )

    def search(self, term_weights, k=10):
        """Retrieve documents for a term-space query."""
        q = self.embed_query_terms(term_weights)
        idx, vals = self.docs.topk_cosine(q, k)
        return idx[0], vals[0]

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            W=np.asarray(self.terms.table),
            Ht=np.asarray(self.docs.table),
        )

    @classmethod
    def load(cls, path: str, mesh=None):
        with np.load(path) as z:
            return cls(z["W"], z["Ht"].T, mesh=mesh)
