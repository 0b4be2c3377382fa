"""Plain-numpy (f64) transcription of the reference HierNMF2 engine.

An INDEPENDENT oracle for the whole L4 tree engine, transcribed directly
from the reference sources (not from smallk_tpu):

  - rank-2 solver body:    common/include/nmf_solver_rank2.hpp
      SystemSolveH (:25-137), SystemSolveW (:139-214),
      OptimalActiveSetH/W (:216-318), operator() (:352-461)
  - solve loop:            common/include/nmf_solve_generic.hpp:34-140
  - PG_RATIO estimator:    common/include/progress_estimator_generic.hpp:75-109
  - projected gradient:    common/include/projected_gradient.hpp:128-160
  - normalization:         common/include/normalize.hpp:25-100
  - node priority (NDCG):  hierclust/include/clust_hier_util.hpp:29-173
  - tree + splits:         hierclust/include/tree.hpp:223-317,375-411
  - ClustHier/TrialSplit/ActualSplit:
                           hierclust/include/clust_hier_generic.hpp:77-517

Initializers come from initdir files (Winit_N.csv / Hinit_N.csv in
factorization-attempt order), the reference's determinism hook
(clust_hier_generic.hpp:568-622).  Column subsets are extracted
compactly; rows with no support in the subset are removed before the
solve and scattered back as zeros afterwards (SubMatrixColsCompact
semantics, sparse_matrix_impl.hpp:479).

The `events` dict records outlier drops and recycles so tests can assert
the TrialSplit retry branches actually executed.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import scipy.sparse as _sp

EPS = np.finfo(np.float64).eps


def _mm_tn(W, A):
    """W' A for dense or scipy-sparse A (the reference's sparse GEMM,
    common/include/sparse_gemm_*.hpp — the CPU anchor must pay sparse
    costs like the reference binary, not densified ones)."""
    if _sp.issparse(A):
        return np.asarray((A.T @ W).T)
    return W.T @ A


def _mm_nt(A, H):
    """A H' for dense or scipy-sparse A."""
    if _sp.issparse(A):
        return np.asarray(A @ H.T)
    return A @ H.T


# --- rank-2 solver pieces (nmf_solver_rank2.hpp) ---------------------------

def _system_solve_h(A, B):
    """Solve A X = B columnwise via the fast Givens rotation
    (SystemSolveH, :25-137).  Returns X or None on singular failure."""
    n = B.shape[1]
    abs_a00 = abs(A[0, 0])
    abs_a01 = abs(A[0, 1])
    if abs_a00 < EPS and abs_a01 < EPS:
        return None
    X = np.empty((2, n))
    if abs_a00 >= abs_a01:
        t = -A[1, 0] / A[0, 0]
        a2 = A[0, 0] - t * A[1, 0]
        b2 = A[0, 1] - t * A[1, 1]
        d2 = A[1, 1] + t * A[0, 1]
        if abs(d2 / a2) < EPS:
            return None
        e2 = B[0, :] - t * B[1, :]
        f2 = B[1, :] + t * B[0, :]
    else:
        ct = -A[0, 0] / A[1, 0]
        a2 = -A[1, 0] + ct * A[0, 0]
        b2 = -A[1, 1] + ct * A[0, 1]
        d2 = A[0, 1] + ct * A[1, 1]
        if abs(d2 / a2) < EPS:
            return None
        e2 = -B[1, :] + ct * B[0, :]
        f2 = B[0, :] + ct * B[1, :]
    x1 = f2 * (1.0 / d2)
    X[1, :] = x1
    X[0, :] = (e2 - b2 * x1) * (1.0 / a2)
    return X


def _system_solve_w(A, B):
    """Solve X A = B rowwise (SystemSolveW, :139-214).  B is (m, 2)."""
    abs_a00 = abs(A[0, 0])
    abs_a01 = abs(A[0, 1])
    if abs_a00 < EPS and abs_a01 < EPS:
        return None
    m = B.shape[0]
    X = np.empty((m, 2))
    if abs_a00 >= abs_a01:
        t = A[0, 1] / A[0, 0]
        a2 = A[0, 0] + t * A[0, 1]
        b2 = A[1, 0] + t * A[1, 1]
        d2 = A[1, 1] - t * A[1, 0]
        if abs(d2 / a2) < EPS:
            return None
        e2 = B[:, 0] + t * B[:, 1]
        f2 = B[:, 1] - t * B[:, 0]
    else:
        ct = A[0, 0] / A[0, 1]
        a2 = A[0, 1] + ct * A[0, 0]
        b2 = A[1, 1] + ct * A[1, 0]
        d2 = A[1, 0] - ct * A[1, 1]
        if abs(d2 / a2) < EPS:
            return None
        e2 = B[:, 1] + ct * B[:, 0]
        f2 = B[:, 0] - ct * B[:, 1]
    x1 = f2 * (1.0 / d2)
    X[:, 1] = x1
    X[:, 0] = (e2 - b2 * x1) * (1.0 / a2)
    return X


def _optimal_active_set_h(H, WtW, WtA):
    """(OptimalActiveSetH, :216-266) in-place fixup of negative columns."""
    v1 = WtA[0, :] / WtW[0, 0]
    v2 = WtA[1, :] / WtW[1, 1]
    pick1 = v1 * np.sqrt(WtW[0, 0]) >= v2 * np.sqrt(WtW[1, 1])
    bad = (H[0, :] <= 0.0) | (H[1, :] <= 0.0)
    H[0, :] = np.where(bad, np.where(pick1, v1, 0.0), H[0, :])
    H[1, :] = np.where(bad, np.where(pick1, 0.0, v2), H[1, :])


def _optimal_active_set_w(W, HHt, AHt):
    """(OptimalActiveSetW, :268-318) in-place fixup of negative rows."""
    v1 = AHt[:, 0] / HHt[0, 0]
    v2 = AHt[:, 1] / HHt[1, 1]
    pick1 = v1 * np.sqrt(HHt[0, 0]) >= v2 * np.sqrt(HHt[1, 1])
    bad = (W[:, 0] <= 0.0) | (W[:, 1] <= 0.0)
    W[:, 0] = np.where(bad, np.where(pick1, v1, 0.0), W[:, 0])
    W[:, 1] = np.where(bad, np.where(pick1, 0.0, v2), W[:, 1])


def _normalize_and_scale(W, H):
    """NormalizeColumns + ScaleRows (normalize.hpp:25-100).  Returns
    the scale factors; raises on a sub-epsilon column norm like the
    reference."""
    norms = np.linalg.norm(W, axis=0)
    if np.any(np.abs(norms) < EPS):
        raise FloatingPointError("Normalize: column norm < machine epsilon")
    W /= norms[None, :]
    H *= norms[:, None]
    return norms


def _pg_norm(gradW, gradH, W, H):
    """ProjectedGradientNorm (projected_gradient.hpp:128-160)."""
    mw = (gradW < 0.0) | (W > 0.0)
    mh = (gradH < 0.0) | (H > 0.0)
    s = float(np.sum(gradW[mw] ** 2) + np.sum(gradH[mh] ** 2))
    return np.sqrt(s)


@dataclasses.dataclass
class NpNmfOptions:
    tol: float = 1e-4
    min_iter: int = 1
    max_iter: int = 5000
    tolcount: int = 1
    normalize: bool = True


def np_rank2_nmf_solve(A, W0, H0, opts: NpNmfOptions):
    """Full NmfSolve loop with the rank-2 solver and PG_RATIO stopping
    (nmf_solve_generic.hpp:34-140).  H0 is accepted for parity with the
    reference signature; the rank-2 solver recomputes H from W0's Grams
    on the first step, so only W0 affects the trajectory.

    Returns (W, H, iterations, success); (None, None, it, False) on
    solver failure.
    """
    W = np.array(W0, dtype=np.float64)
    H = np.array(H0, dtype=np.float64)

    # solver.Init (nmf_solver_rank2.hpp:331-346)
    WtW = W.T @ W
    WtA = _mm_tn(W, A)

    pg0 = None
    success = False
    success_count = 0
    it = 0
    for it in range(opts.max_iter):
        # --- one solver step (operator(), :352-461) ---
        Hn = _system_solve_h(WtW, WtA)
        if Hn is None:
            return None, None, it, False
        H = Hn
        _optimal_active_set_h(H, WtW, WtA)
        HHt = H @ H.T
        AHt = _mm_nt(A, H)
        Wn = _system_solve_w(HHt, AHt)
        if Wn is None:
            return None, None, it, False
        W = Wn
        _optimal_active_set_w(W, HHt, AHt)
        s = _normalize_and_scale(W, H)
        # rescale HHt/AHt by the factors instead of re-Gemm-ing (:429-442)
        HHt = HHt * np.outer(s, s)
        AHt = AHt * s[None, :]
        gradW = W @ HHt - AHt
        WtW = W.T @ W
        WtA = _mm_tn(W, A)
        gradH = WtW @ H - WtA

        # --- progress estimation (nmf_solve_generic.hpp:81-120) ---
        if it < opts.min_iter:
            if it == 0:
                pg0 = _pg_norm(gradW, gradH, W, H)
            continue
        if it == 0:
            pg0 = _pg_norm(gradW, gradH, W, H)
            metric = 1.0
        else:
            metric = _pg_norm(gradW, gradH, W, H) / pg0
        if metric <= opts.tol:
            success_count += 1
            if success_count >= opts.tolcount:
                success = True
                break
        else:
            success_count = 0

    if opts.normalize:
        _normalize_and_scale(W, H)
    if not success and (it + 1) >= opts.max_iter:
        success = True  # reaching max_iter counts as success (:132-135)
    # iterations = completed solver steps (it is the 0-based index of the
    # last completed step) — matches smallk_tpu's SolveResult.iterations
    return W, H, it + 1, success


# --- node priority (clust_hier_util.hpp) -----------------------------------

def _desc_ordered(values):
    """desc_ordered (:44-57): descending, ties by lower index."""
    return np.array(sorted(range(len(values)),
                           key=lambda i: (-values[i], i)), dtype=int)


def _ordered(values):
    """ordered (:29-41): ascending, ties by lower index."""
    return np.array(sorted(range(len(values)),
                           key=lambda i: (values[i], i)), dtype=int)


def _ndcg_part(ground, test, weight, weight_part):
    """NDCG_part (:62-99)."""
    seq_idx = _ordered(ground)
    temp_weight_part = weight_part[seq_idx]
    n = len(test)
    disc = np.ones(n)
    disc[1:] = np.log2(np.arange(1, n) + 1)
    cum_score = np.sum(temp_weight_part[test] / disc)
    ideal = np.sort(weight)[::-1]
    cum_ideal = np.sum(ideal / disc)
    return cum_score / cum_ideal


def np_compute_priority(w_parent, W_child):
    """compute_priority (:105-173)."""
    w_parent = np.asarray(w_parent, dtype=np.float64).reshape(-1)
    n = len(w_parent)
    n_part = int(np.count_nonzero(w_parent))
    idx_parent = _desc_ordered(w_parent)
    idx_child1 = _desc_ordered(np.asarray(W_child[:, 0]).reshape(-1))
    idx_child2 = _desc_ordered(np.asarray(W_child[:, 1]).reshape(-1))
    if n_part <= 1:
        return -3.0

    weight = np.log(np.arange(n, 0, -1, dtype=np.float64))
    zero_pos = np.where(w_parent[idx_parent] == 0)[0]
    if len(zero_pos) > 0:
        weight[zero_pos[0]:] = 1.0
    weight_part = np.zeros(n)
    weight_part[:n_part] = np.log(np.arange(n_part, 0, -1,
                                            dtype=np.float64))

    idx1 = _ordered(idx_child1)  # rank of each term in child 1
    idx2 = _ordered(idx_child2)
    max_pos = np.maximum(idx1, idx2)
    discount = np.log((n - max_pos[idx_parent]).astype(np.float64))
    discount[discount == 0] = np.log(2.0)
    weight = weight / discount
    weight_part = weight_part / discount
    return float(
        _ndcg_part(idx_parent, idx_child1, weight, weight_part)
        * _ndcg_part(idx_parent, idx_child2, weight, weight_part)
    )


# --- tree (tree.hpp) --------------------------------------------------------

@dataclasses.dataclass
class NpNode:
    priority: float = 0.0
    parent: int = -1
    left_child: int = -1
    right_child: int = -1
    is_valid: bool = False
    docs: np.ndarray | None = None
    topic_vector: np.ndarray | None = None


class NpTree:
    def __init__(self, num_clusters, n_docs):
        self.node_count = 2 * (num_clusters - 1)
        self.nodes = [NpNode() for _ in range(self.node_count)]
        self.is_leaf = [False] * self.node_count
        self.active = 0
        self.index0 = self.index1 = -1
        self.n_docs = n_docs

    def split_root(self, W, H):
        left = H[0, :] > H[1, :]
        docs = np.arange(self.n_docs, dtype=np.int64)
        self.index0, self.index1 = 0, 1
        self.active = 2
        for idx, sel in ((0, left), (1, ~left)):
            self.nodes[idx] = NpNode(is_valid=True, docs=docs[sel],
                                     topic_vector=np.array(W[:, idx]))
            self.is_leaf[idx] = True

    def split(self, node_index, W, H):
        parent = self.nodes[node_index]
        left = H[0, :] > H[1, :]
        self.index0, self.index1 = self.active, self.active + 1
        self.active += 2
        parent_docs = parent.docs
        parent.left_child = self.index0
        parent.right_child = self.index1
        self.is_leaf[node_index] = False
        for idx, sel, col in ((self.index0, left, 0),
                              (self.index1, ~left, 1)):
            self.nodes[idx] = NpNode(
                is_valid=True, parent=node_index,
                docs=parent_docs[sel],
                topic_vector=np.array(W[:, col]),
            )
            self.is_leaf[idx] = True

    def min_max_leaf_priorities(self):
        min_p = np.finfo(np.float64).max
        max_p = -np.finfo(np.float64).max
        max_idx = -1
        for q in range(self.node_count):
            if not self.is_leaf[q]:
                continue
            p = self.nodes[q].priority
            if 0 < p < min_p:
                min_p = p
            if p > max_p:
                max_p = p
                max_idx = q
        return min_p, max_p, max_idx

    def assignments(self):
        out = np.full(self.n_docs, -1, dtype=np.int64)
        for q in range(self.node_count):
            if self.is_leaf[q]:
                out[self.nodes[q].docs] = q
        return out


# --- the engine (clust_hier_generic.hpp) ------------------------------------

class _Initializers:
    """LoadInitializers (clust_hier_generic.hpp:568-622): Winit_N.csv /
    Hinit_N.csv consumed in factorization-attempt order.

    With initdir=None and an `rng` (numpy RandomState), initializers are
    drawn uniform in memory instead — the reference's default random
    path (clust_hier_generic.hpp:548-566); used by the 100-leaf CPU
    anchor measurement (scripts/oracle_anchor.py), where writing 200+
    initializer CSVs would dominate the wall clock."""

    def __init__(self, initdir, m, n, rng=None):
        self.initdir, self.m, self.n = initdir, m, n
        self.counter = 1
        self.rng = rng

    def next(self):
        if self.initdir is None:
            self.counter += 1
            return (self.rng.rand(self.m, 2),
                    self.rng.rand(2, self.n))
        W = np.genfromtxt(
            os.path.join(self.initdir, f"Winit_{self.counter}.csv"),
            delimiter=",", dtype=np.float64,
        ).reshape(self.m, 2)
        H = np.genfromtxt(
            os.path.join(self.initdir, f"Hinit_{self.counter}.csv"),
            delimiter=",", dtype=np.float64,
        ).reshape(2, self.n)
        self.counter += 1
        return W, H


@dataclasses.dataclass
class NpClustOptions:
    num_clusters: int
    unbalanced: float = 0.1
    trial_allowance: int = 3
    nmf: NpNmfOptions = dataclasses.field(default_factory=NpNmfOptions)


def _actual_split(A, subset, w_parent, inits, opts, events):
    """ActualSplit (clust_hier_generic.hpp:383-517).  Returns
    (priority, W (m,2), labels (|subset|,))."""
    m = A.shape[0]
    if len(subset) <= 3:
        return -1.0, np.zeros((m, 2)), np.ones(len(subset), dtype=np.int64)

    # SubMatrixColsCompact: extract subset cols, drop zero rows
    Asub_full = A[:, subset]
    if _sp.issparse(Asub_full):
        Asub_full = Asub_full.tocsc()
        row_support = np.unique(Asub_full.tocoo().row)
        Asub = Asub_full[row_support, :]
    else:
        row_support = np.where(np.any(Asub_full != 0, axis=1))[0]
        Asub = Asub_full[row_support, :]

    success = False
    for _attempt in range(3):
        W0f, H0f = inits.next()
        Wsub = W0f[row_support, :]
        Hsub = H0f[:, subset]
        Wn, Hn, iters, success = np_rank2_nmf_solve(
            Asub, Wsub, Hsub, opts.nmf
        )
        if success:
            events["nmf_count"] += 1
            events["iter_count"] += iters
            break
    if not success:
        raise RuntimeError("oracle: node factorization failed 3x")

    labels = np.where(Hn[0, :] > Hn[1, :], 0, 1).astype(np.int64)
    W = np.zeros((m, 2))
    W[row_support, :] = Wn
    priority = -1.0
    if (labels == 0).any() and (labels == 1).any():
        priority = np_compute_priority(w_parent, W)
    return priority, W, labels


def _trial_split(A, subset, min_priority, w_parent, inits, opts, events):
    """TrialSplit (clust_hier_generic.hpp:245-376).  Returns
    (priority, subset, W, labels)."""
    subset = np.asarray(subset, dtype=np.int64)
    subset_backup = subset.copy()
    subset_small = np.empty(0, dtype=np.int64)

    trial = 0
    priority_one = -2.0
    W = labels = None
    while trial < opts.trial_allowance:
        priority_one, W, labels = _actual_split(
            A, subset, w_parent, inits, opts, events
        )
        if priority_one < 0:
            break
        counts = np.array([(labels == 0).sum(), (labels == 1).sum()])
        smallest = int(counts.min())
        if smallest < opts.unbalanced * len(labels):
            label_small = 0 if smallest == counts[0] else 1
            subset_small = subset[labels == label_small]
            pr_small, _, _ = _actual_split(
                A, subset_small, W[:, label_small], inits, opts, events
            )
            if pr_small < min_priority:
                trial += 1
                if trial < opts.trial_allowance:
                    events["drops"].append(len(subset_small))
                    subset = np.setdiff1d(subset, subset_small)
            else:
                break
        else:
            break

    if trial == opts.trial_allowance:
        events["recycles"].append(len(subset_small))
        subset = subset_backup
        W = np.zeros((A.shape[0], 2))
        labels = np.ones(len(subset), dtype=np.int64)
        priority_one = -2.0
    return priority_one, subset, W, labels


def np_clust_hier(A, opts: NpClustOptions, initdir, rng=None):
    """ClustHier (clust_hier_generic.hpp:77-238).  Returns
    (NpTree, events); events = {nmf_count, iter_count, drops,
    recycles}.  `rng`: random in-memory initializers when initdir is
    None (the reference's default path).  Sparse A stays sparse — the
    reference's entire pipeline is sparse-first."""
    if _sp.issparse(A):
        A = A.tocsc().astype(np.float64)
    else:
        A = np.asarray(A, dtype=np.float64)
    m, n = A.shape
    inits = _Initializers(initdir, m, n, rng=rng)
    events = {"nmf_count": 0, "iter_count": 0, "drops": [],
              "recycles": []}

    tree = NpTree(opts.num_clusters, n)
    # factor the root (<= 3 attempts)
    success = False
    for _attempt in range(3):
        W0, H0 = inits.next()
        W, H, iters, success = np_rank2_nmf_solve(A, W0, H0, opts.nmf)
        if success:
            events["nmf_count"] += 1
            events["iter_count"] += iters
            break
    if not success:
        raise RuntimeError("oracle: root factorization failed 3x")

    W_buffer = [None] * tree.node_count
    H_buffer = [None] * tree.node_count

    split_index = 0
    for i in range(opts.num_clusters - 1):
        if i == 0:
            min_priority = np.inf
            tree.split_root(W, H)
        else:
            min_priority, max_priority, split_index = (
                tree.min_max_leaf_priorities()
            )
            if max_priority < 0:
                break
            W = W_buffer[split_index]
            H = H_buffer[split_index]
            tree.split(split_index, W, H)

        for idx in (tree.index0, tree.index1):
            node = tree.nodes[idx]
            priority, subset, W_c, labels = _trial_split(
                A, node.docs, min_priority, node.topic_vector, inits,
                opts, events,
            )
            node.docs = subset
            node.priority = priority
            W_buffer[idx] = W_c
            # store labels as an H surrogate: split() only consumes
            # H[0] > H[1] (tree.hpp:256), so a 2-row indicator suffices
            Hi = np.zeros((2, len(subset)))
            Hi[0, :] = (labels == 0).astype(np.float64)
            Hi[1, :] = (labels == 1).astype(np.float64) * 0.5
            H_buffer[idx] = Hi

    return tree, events
