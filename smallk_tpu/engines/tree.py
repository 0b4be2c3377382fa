"""Binary cluster tree for hierarchical NMF.

Reference: hierclust/include/tree.hpp (Tree / TreeNode).  Flat-array tree;
the root is not stored; children of the root occupy indices 0 and 1; each
split appends two nodes.  Node id == index in the node array.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

NONE = -1
MAX_PRIORITY = np.finfo(np.float64).max


class SlabHolder:
    """Mutable handle on the chain engine's device-resident factor slab
    ((node_count+1, m, 2)).  The multi-split chain rebuilds the slab
    functionally each segment; every DeviceColumn/SlabPair holds THIS
    object and reads `.current` at consumption time, so old slab
    versions are freed instead of being pinned by per-node views."""

    __slots__ = ("current", "topterms")

    def __init__(self, current=None):
        self.current = current
        # (nodes+1, 2, mt) int32 — per-column top-term indices of the
        # current slab, computed inside the chain's segment fetch so the
        # final compute_top_terms needs no extra device round trip
        self.topterms = None


def _unwrap(buf):
    return buf.current if isinstance(buf, SlabHolder) else buf


class SlabPair:
    """Lazy view of node `node`'s (m, 2) factor block inside a device
    slab — the chain engine's W_buffer entry (avoids one device slice
    dispatch per committed node)."""

    __slots__ = ("holder", "node")

    def __init__(self, holder, node: int):
        self.holder = holder
        self.node = node

    def materialize(self):
        return _unwrap(self.holder)[self.node]


class DeviceColumn:
    """Lazy view of one column of a device-resident (m, 2) factor buffer
    (or, with `node` set, of row `node` of a (nodes, m, 2) slab).

    Tree splits record both children's topic vectors; slicing a device
    array eagerly would cost one dispatch per column through a
    high-latency link, so the slice is deferred until a consumer needs
    the vector — and the batched consumers (top terms, flatclust init)
    read `.buf` inside one jitted program instead."""

    __slots__ = ("buf", "col", "node")

    def __init__(self, buf, col: int, node: int | None = None):
        self.buf = buf
        self.col = col
        self.node = node

    def materialize(self):
        buf = _unwrap(self.buf)
        if self.node is not None:
            return buf[self.node, :, self.col]
        return buf[:, self.col]


def _gather_columns(nodes):
    """(bufs tuple, ((buf_idx, node, col), ...) rows) for a list of nodes
    whose topic vectors are DeviceColumns — dedups shared buffers so
    sibling pairs (and the chain's whole slab) ship one array.  `node`
    is -1 for plain (m, 2) buffers."""
    bufs, index, rows = [], {}, []
    for node in nodes:
        tv = node.topic_vector
        key = id(tv.buf)
        if key not in index:
            index[key] = len(bufs)
            bufs.append(_unwrap(tv.buf))
        rows.append((index[key], -1 if tv.node is None else tv.node,
                     tv.col))
    return tuple(bufs), tuple(rows)


_rank_jit = None
_stack_jit = None


def _rank_topic_columns(bufs, rows, max_terms):
    """Batched descending stable argsort of the selected buffer columns
    (one jitted program; retraces only per distinct tree shape)."""
    global _rank_jit
    if _rank_jit is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(
            jax.jit, static_argnames=("rows", "max_terms")
        )
        def _impl(bufs, rows, max_terms):
            stacked = jnp.stack([
                bufs[b][:, c] if nd < 0 else bufs[b][nd, :, c]
                for b, nd, c in rows
            ], axis=0)
            return jnp.argsort(-stacked, axis=1, stable=True)[:, :max_terms]

        _rank_jit = _impl
    return _rank_jit(bufs, rows, max_terms)


def _stack_topic_columns(bufs, rows):
    """(m, len(rows)) device stack of the selected buffer columns."""
    global _stack_jit
    if _stack_jit is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("rows",))
        def _impl(bufs, rows):
            return jnp.stack([
                bufs[b][:, c] if nd < 0 else bufs[b][nd, :, c]
                for b, nd, c in rows
            ], axis=1)

        _stack_jit = _impl
    return _stack_jit(bufs, rows)


@dataclasses.dataclass
class TreeNode:
    """Reference: TreeNode (tree.hpp:32-53)."""

    priority: float = 0.0
    # Pop-ordering key (== priority under the reference's "ndcg" policy;
    # priority * |docs| under "size_ndcg" — see ClustOptions.priority_method).
    # Gates that compare priorities against TrialSplit's min_priority always
    # use the raw `priority`; only the argmax pop uses this.
    pop_priority: float = 0.0
    parent_index: int = NONE
    left_child_index: int = NONE
    right_child_index: int = NONE
    is_valid: bool = False
    is_left_child: bool = False
    topic_vector: Optional[np.ndarray] = None  # (m,)
    term_indices: Optional[np.ndarray] = None  # top-ranked term indices
    docs: Optional[np.ndarray] = None  # document indices at this node


class Tree:
    """Flat-array binary tree (reference Tree, tree.hpp:57-158)."""

    def __init__(self):
        self.nodes: List[TreeNode] = []
        self.is_leaf: List[bool] = []
        self.active_nodes = 0
        self.index0 = NONE
        self.index1 = NONE
        self.total_docs = 0
        self.leaf_doc_count = 0
        self.outliers: np.ndarray = np.empty(0, dtype=np.int64)
        self.assignments: np.ndarray = np.empty(0, dtype=np.int64)

    def init(self, num_clusters: int, term_count: int,
             doc_count: int) -> None:
        """Allocate the flat node array: 2*(num_clusters-1) nodes, two
        per split (reference Tree::Init, tree.hpp:92-109)."""
        node_count = 2 * (num_clusters - 1)
        self.total_docs = doc_count
        self.term_count = term_count
        self.nodes = [TreeNode() for _ in range(node_count)]
        self.is_leaf = [False] * node_count
        self.active_nodes = 0

    # --- split operations -------------------------------------------------

    def split_root(self, W, H=None, labels=None) -> None:
        """Partition all docs between the root's two children by
        H(0,c) > H(1,c) (reference SplitRoot, tree.hpp:223-263).

        `labels`: optional precomputed boolean "goes left" mask — the
        device-resident hierclust engine computes it on chip and fetches
        only this small vector instead of the full H."""
        self.index0, self.index1 = 0, 1
        for idx, is_left in ((0, True), (1, False)):
            node = self.nodes[idx]
            node.parent_index = NONE
            node.left_child_index = NONE
            node.right_child_index = NONE
            node.is_valid = True
            node.is_left_child = is_left
            self.is_leaf[idx] = True
        self.active_nodes += 2

        left = self._left_mask(H, labels)
        all_docs = np.arange(len(left), dtype=np.int64)
        self.nodes[0].docs = all_docs[left]
        self.nodes[1].docs = all_docs[~left]
        self._update_topic_vectors(W)

    @staticmethod
    def _left_mask(H, labels):
        if labels is not None:
            return np.asarray(labels, dtype=bool)
        H = np.asarray(H)
        return H[0, :] > H[1, :]

    def split(self, node_index: int, W, H=None, labels=None) -> None:
        """Split an existing leaf; H has one column per doc in the node's
        subset (reference Split, tree.hpp:267-317).  `labels` as in
        split_root."""
        self.index0 = self.active_nodes
        self.index1 = self.active_nodes + 1
        self.active_nodes += 2

        parent = self.nodes[node_index]
        parent.left_child_index = self.index0
        parent.right_child_index = self.index1
        self.is_leaf[node_index] = False

        for idx, is_left in ((self.index0, True), (self.index1, False)):
            node = self.nodes[idx]
            node.parent_index = node_index
            node.left_child_index = NONE
            node.right_child_index = NONE
            node.is_valid = True
            node.is_left_child = is_left
            self.is_leaf[idx] = True

        source_docs = parent.docs
        left = self._left_mask(H, labels)
        self.nodes[self.index0].docs = source_docs[left]
        self.nodes[self.index1].docs = source_docs[~left]
        self._update_topic_vectors(W)

    def _update_topic_vectors(self, W) -> None:
        if isinstance(W, SlabPair):
            # chain engine: columns of the popped node's factor block,
            # read lazily out of the shared device slab
            self.nodes[self.index0].topic_vector = DeviceColumn(
                W.holder, 0, W.node
            )
            self.nodes[self.index1].topic_vector = DeviceColumn(
                W.holder, 1, W.node
            )
        elif isinstance(W, np.ndarray):
            self.nodes[self.index0].topic_vector = np.array(W[:, 0])
            self.nodes[self.index1].topic_vector = np.array(W[:, 1])
        else:
            # device array: keep the buffer on device and record LAZY
            # column views (no d2h, and no per-split slice dispatch);
            # consumers (priority scoring, batched top terms, flatclust
            # init) run on device, serialization fetches on demand
            self.nodes[self.index0].topic_vector = DeviceColumn(W, 0)
            self.nodes[self.index1].topic_vector = DeviceColumn(W, 1)

    # --- queries ----------------------------------------------------------

    def min_max_leaf_priorities(self):
        """Returns (min_pos_priority, max_pop_priority, max_index).
        Min considers only positive RAW priorities (tree.hpp:193-219) —
        it feeds TrialSplit's outlier gate, which compares NDCG values;
        the argmax uses pop_priority (== priority unless a size-aware
        pop policy is active)."""
        min_p = np.finfo(np.float64).max
        max_p = -np.finfo(np.float64).max
        max_idx = NONE
        for q, leaf in enumerate(self.is_leaf):
            if not leaf:
                continue
            p = self.nodes[q].priority
            if 0 < p < min_p:
                min_p = p
            pp = self.nodes[q].pop_priority
            if pp > max_p:
                max_p = pp
                max_idx = q
        return min_p, max_p, max_idx

    def set_node_priority(self, node_index: int, priority: float,
                          pop_priority: float | None = None) -> None:
        self.nodes[node_index].priority = float(priority)
        self.nodes[node_index].pop_priority = float(
            priority if pop_priority is None else pop_priority
        )

    def left_child_docs(self):
        return self.nodes[self.index0].docs

    def right_child_docs(self):
        return self.nodes[self.index1].docs

    def left_child_topic_vector(self):
        return self.nodes[self.index0].topic_vector

    def right_child_topic_vector(self):
        return self.nodes[self.index1].topic_vector

    # --- results ----------------------------------------------------------

    def compute_top_terms(self, max_terms: int) -> None:
        from .assignments import top_terms

        # device topic vectors are ranked in ONE batched argsort and one
        # small fetch ((nodes, max_terms) int32) — per-node host top_terms
        # would cost a d2h round trip per node.  The column slices happen
        # INSIDE the jitted program (DeviceColumn defers them), so the
        # whole ranking is one dispatch regardless of node count.
        dev = []
        for node in self.nodes:
            tv = node.topic_vector
            if (not node.is_valid or tv is None
                    or isinstance(tv, np.ndarray)):
                continue
            # chain-committed nodes: the segment fetch already carried
            # this slab column's ranking (same stable argsort — bit
            # identical); consume it instead of a device round trip
            if (isinstance(tv, DeviceColumn) and tv.node is not None
                    and isinstance(tv.buf, SlabHolder)
                    and tv.buf.topterms is not None
                    and tv.buf.topterms.shape[2] >= max_terms):
                node.term_indices = (
                    tv.buf.topterms[tv.node, tv.col, :max_terms]
                    .astype(np.int32)
                )
                continue
            dev.append(node)
        if dev:
            bufs, rows = _gather_columns(dev)
            order = np.asarray(_rank_topic_columns(bufs, rows, max_terms))
            for q, node in enumerate(dev):
                # int32, matching host top_terms (assignments.py) so the
                # dtype does not depend on which path built the node
                node.term_indices = order[q].astype(np.int32)
        for node in self.nodes:
            if (node.is_valid and node.topic_vector is not None
                    and isinstance(node.topic_vector, np.ndarray)):
                node.term_indices = top_terms(node.topic_vector, max_terms)

    def compute_assignments(self) -> None:
        """Docs in leaf nodes get the leaf index; unassigned docs are
        outliers labeled -1 (reference ComputeAssignments, tree.hpp:375)."""
        self.assignments = np.full(self.total_docs, NONE, dtype=np.int64)
        self.leaf_doc_count = 0
        for q, leaf in enumerate(self.is_leaf):
            if not leaf:
                continue
            docs = self.nodes[q].docs
            self.leaf_doc_count += len(docs)
            self.assignments[docs] = q
        self.outliers = np.where(self.assignments == NONE)[0]
        assert self.leaf_doc_count + len(self.outliers) == self.total_docs

    def flatclust_init_w(self, m: int, k: int):
        """Leaf topic vectors -> (m, k) W initializer for flat refinement
        (reference FlatclustInitW, tree.hpp:414-460).  Returns a device
        array (no host round trip) when the vectors live on device."""
        leaves = [q for q, leaf in enumerate(self.is_leaf) if leaf]
        if len(leaves) != k:
            raise ValueError(
                f"flatclust needs {k} leaves, tree has {len(leaves)}"
            )
        vecs = [self.nodes[q].topic_vector for q in leaves]
        if all(isinstance(v, DeviceColumn) for v in vecs):
            nodes = [self.nodes[q] for q in leaves]
            bufs, rows = _gather_columns(nodes)
            return _stack_topic_columns(bufs, rows)
        if any(not isinstance(v, np.ndarray) for v in vecs):
            import jax.numpy as jnp

            return jnp.stack([
                v.materialize() if isinstance(v, DeviceColumn)
                else jnp.asarray(v)
                for v in vecs
            ], axis=1)
        W = np.zeros((m, k))
        for c, q in enumerate(leaves):
            W[:, c] = vecs[c]
        return W

    # --- serialization (checkpoint/resume support) ------------------------

    def to_arrays(self) -> dict:
        """Serialize the tree into flat arrays (for npz checkpoints)."""
        nc = len(self.nodes)
        out = {
            "node_count": np.int64(nc),
            "total_docs": np.int64(self.total_docs),
            "term_count": np.int64(getattr(self, "term_count", 0)),
            "active_nodes": np.int64(self.active_nodes),
            "index0": np.int64(self.index0),
            "index1": np.int64(self.index1),
            "is_leaf": np.asarray(self.is_leaf, dtype=bool),
            "priority": np.array([n.priority for n in self.nodes]),
            "pop_priority": np.array(
                [n.pop_priority for n in self.nodes]
            ),
            "parent": np.array([n.parent_index for n in self.nodes],
                               dtype=np.int64),
            "left": np.array([n.left_child_index for n in self.nodes],
                             dtype=np.int64),
            "right": np.array([n.right_child_index for n in self.nodes],
                              dtype=np.int64),
            "is_valid": np.array([n.is_valid for n in self.nodes],
                                 dtype=bool),
            "is_left_child": np.array(
                [n.is_left_child for n in self.nodes], dtype=bool
            ),
        }
        docs = [
            n.docs if n.docs is not None else np.empty(0, np.int64)
            for n in self.nodes
        ]
        out["docs_flat"] = (
            np.concatenate(docs) if docs else np.empty(0, np.int64)
        )
        out["docs_offsets"] = np.cumsum(
            [0] + [len(d) for d in docs]
        ).astype(np.int64)
        out["has_docs"] = np.array(
            [n.docs is not None for n in self.nodes], dtype=bool
        )
        tv = [
            (n.topic_vector.materialize()
             if isinstance(n.topic_vector, DeviceColumn)
             else n.topic_vector)
            if n.topic_vector is not None
            else np.zeros(getattr(self, "term_count", 0))
            for n in self.nodes
        ]
        out["topic_vectors"] = (
            np.stack([np.asarray(v) for v in tv], axis=1)
            if tv else np.zeros((0, 0))
        )
        out["has_tv"] = np.array(
            [n.topic_vector is not None for n in self.nodes], dtype=bool
        )
        return out

    @classmethod
    def from_arrays(cls, arrs) -> "Tree":
        """Rebuild a tree from to_arrays output."""
        tree = cls()
        nc = int(arrs["node_count"])
        tree.total_docs = int(arrs["total_docs"])
        tree.term_count = int(arrs["term_count"])
        tree.active_nodes = int(arrs["active_nodes"])
        tree.index0 = int(arrs["index0"])
        tree.index1 = int(arrs["index1"])
        tree.is_leaf = [bool(x) for x in arrs["is_leaf"]]
        tree.nodes = []
        offs = arrs["docs_offsets"]
        for q in range(nc):
            node = TreeNode(
                priority=float(arrs["priority"][q]),
                # legacy checkpoints predate pop_priority; under the only
                # policy they could have run ("ndcg") pop == priority
                pop_priority=float(
                    arrs["pop_priority"][q] if "pop_priority" in arrs
                    else arrs["priority"][q]
                ),
                parent_index=int(arrs["parent"][q]),
                left_child_index=int(arrs["left"][q]),
                right_child_index=int(arrs["right"][q]),
                is_valid=bool(arrs["is_valid"][q]),
                is_left_child=bool(arrs["is_left_child"][q]),
            )
            if bool(arrs["has_docs"][q]):
                node.docs = np.array(
                    arrs["docs_flat"][offs[q]:offs[q + 1]], dtype=np.int64
                )
            if bool(arrs["has_tv"][q]):
                node.topic_vector = np.array(arrs["topic_vectors"][:, q])
            tree.nodes.append(node)
        return tree

    def write_assignments(self, filepath: str) -> None:
        """Two-section CSV: labels (-1 for outliers), blank line, outlier
        indices (reference WriteAssignments, tree.hpp:464-506)."""
        with open(filepath, "w") as f:
            f.write(",".join(str(int(a)) for a in self.assignments))
            f.write("\n\n")
            if len(self.outliers) > 0:
                f.write(",".join(str(int(q)) for q in self.outliers))
                f.write("\n")

    def write_tree(self, writer, filepath: str, dictionary) -> None:
        """Emit all nodes through a result writer (XML/JSON)."""
        with open(filepath, "w") as f:
            writer.write_header(f, self.leaf_doc_count)
            for q, node in enumerate(self.nodes):
                writer.write_node(
                    f,
                    node_id=q,
                    parent_id=node.parent_index,
                    is_left_child=node.is_left_child,
                    left_child_id=node.left_child_index,
                    right_child_id=node.right_child_index,
                    doc_count=0 if node.docs is None else len(node.docs),
                    term_indices=(
                        [] if node.term_indices is None
                        else list(node.term_indices)
                    ),
                    dictionary=dictionary,
                )
            writer.write_footer(f)
