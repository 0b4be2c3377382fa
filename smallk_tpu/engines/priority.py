"""Node priority scoring for hierarchical clustering (modified NDCG).

Reference: hierclust/include/clust_hier_util.hpp
  - compute_priority (:105-173): score a candidate split by comparing the
    parent topic vector's term ranking against both children's rankings,
    log-discounted (NDCG-style).  Returns -3 when the parent has <= 1
    nonzero terms.
  - NDCG_part (:62-99).

Two implementations with identical semantics:
  - compute_priority: host numpy (reference transcription, used by the
    initdir/resume paths and as the parity oracle);
  - compute_priority_device: pure-jnp, traced inside the fused node-solve
    program so hierclust never ships W back to the host just to score a
    split (the d2h round trip costs more than the whole NDCG).
"""

from __future__ import annotations

import numpy as np


def _desc_ordered(values: np.ndarray) -> np.ndarray:
    """Indices sorting values descending, ties by lower index first
    (reference desc_ordered, clust_hier_util.hpp:46-57)."""
    # stable sort on negated values preserves index order within ties
    return np.argsort(-values, kind="stable")


def _inverse_permutation(p: np.ndarray) -> np.ndarray:
    inv = np.empty_like(p)
    inv[p] = np.arange(len(p))
    return inv


def _ndcg_part(ground: np.ndarray, test: np.ndarray, weight: np.ndarray,
               weight_part: np.ndarray) -> float:
    """Reference NDCG_part (clust_hier_util.hpp:62-99).

    ground/test: permutations (rank -> term index).
    weight/weight_part: per-parent-rank weights.
    """
    n = len(test)
    # per-term weight: weight_part at the parent rank of each term
    seq_idx = _inverse_permutation(ground)  # term -> parent rank
    temp_weight_part = weight_part[seq_idx]  # per-term

    uncum = temp_weight_part[test].astype(np.float64)
    i = np.arange(n)
    disc = np.ones(n)
    disc[1:] = np.log2(i[1:] + 1)
    uncum = uncum / disc
    cum_score = np.cumsum(uncum)

    ideal = np.sort(weight)[::-1].astype(np.float64)
    ideal = ideal / disc
    cum_ideal = np.cumsum(ideal)

    return float(cum_score[-1] / cum_ideal[-1])


def compute_priority(w_parent: np.ndarray, w_child: np.ndarray) -> float:
    """Score a split of the node with topic vector `w_parent` (m,) into the
    two children given by the columns of `w_child` (m, 2).

    Reference: compute_priority (clust_hier_util.hpp:105-173).
    """
    w_parent = np.asarray(w_parent).reshape(-1)
    n = len(w_parent)
    n_part = int(np.count_nonzero(w_parent))
    if n_part <= 1:
        return -3.0

    idx_parent = _desc_ordered(w_parent)
    idx_child1 = _desc_ordered(np.asarray(w_child[:, 0]).reshape(-1))
    idx_child2 = _desc_ordered(np.asarray(w_child[:, 1]).reshape(-1))

    # weight[i] = log(n - i); positions at/after the first zero-parent-value
    # rank get weight 1
    weight = np.log(np.arange(n, 0, -1).astype(np.float64))
    sorted_parent_vals = w_parent[idx_parent]
    zeros = np.where(sorted_parent_vals == 0)[0]
    if len(zeros) > 0:
        weight[zeros[0]:] = 1.0

    weight_part = np.zeros(n)
    weight_part[:n_part] = np.log(
        np.arange(n_part, 0, -1).astype(np.float64)
    )

    # per-term worst rank across the two children
    rank1 = _inverse_permutation(idx_child1)
    rank2 = _inverse_permutation(idx_child2)
    max_pos = np.maximum(rank1, rank2)

    discount = np.log((n - max_pos[idx_parent]).astype(np.float64))
    discount[discount == 0] = np.log(2.0)
    weight = weight / discount
    weight_part = weight_part / discount

    return (
        _ndcg_part(idx_parent, idx_child1, weight, weight_part)
        * _ndcg_part(idx_parent, idx_child2, weight, weight_part)
    )


def compute_priority_device(w_parent, w_child):
    """jnp transcription of compute_priority, traceable under jit.

    Scores run in w_parent's float dtype (f64 on the CPU test mesh, f32 on
    TPU); priorities only order candidate splits, so the f32 cumulative
    error (~1e-6 relative here) never matters except at exact ties, which
    are the sentinel constants (-1/-2/-3) both versions produce exactly.

    Only the totals of the reference's cumulative NDCG scores are used
    (cum_score[-1] == sum), so the device version skips the cumsums.
    """
    import jax.numpy as jnp

    w_parent = jnp.reshape(w_parent, (-1,))
    n = w_parent.shape[0]
    fl = w_parent.dtype
    i = jnp.arange(n)
    i32 = i.astype(jnp.int32)

    n_part = jnp.count_nonzero(w_parent)
    idx_parent = jnp.argsort(-w_parent, stable=True)
    idx_c1 = jnp.argsort(-w_child[:, 0], stable=True)
    idx_c2 = jnp.argsort(-w_child[:, 1], stable=True)

    # weight[i] = log(n - i); ranks at/after the first zero parent value
    # get weight 1 (topic vectors are nonnegative, so "first zero onward"
    # is a cumulative condition on the descending sort)
    weight = jnp.log((n - i).astype(fl))
    sorted_vals = w_parent[idx_parent]
    zero_seen = jnp.cumsum((sorted_vals == 0).astype(jnp.int32)) > 0
    weight = jnp.where(zero_seen, jnp.asarray(1.0, fl), weight)
    weight_part = jnp.where(
        i < n_part,
        jnp.log(jnp.maximum(n_part - i, 1).astype(fl)),
        jnp.asarray(0.0, fl),
    )

    # per-term worst rank across the two children
    rank1 = jnp.zeros(n, jnp.int32).at[idx_c1].set(i32)
    rank2 = jnp.zeros(n, jnp.int32).at[idx_c2].set(i32)
    max_pos = jnp.maximum(rank1, rank2)
    discount = jnp.log((n - max_pos[idx_parent]).astype(fl))
    discount = jnp.where(
        discount == 0, jnp.log(jnp.asarray(2.0, fl)), discount
    )
    weight = weight / discount
    weight_part = weight_part / discount

    # NDCG_part totals (clust_hier_util.hpp:62-99)
    seq_idx = jnp.zeros(n, jnp.int32).at[idx_parent].set(i32)
    temp_wp = weight_part[seq_idx]
    disc = jnp.where(
        i >= 1, jnp.log2((i + 1).astype(fl)), jnp.asarray(1.0, fl)
    )
    ideal_sum = jnp.sum(jnp.sort(weight)[::-1] / disc)

    def part(test):
        return jnp.sum(temp_wp[test] / disc) / ideal_sum

    pr = part(idx_c1) * part(idx_c2)
    return jnp.where(n_part <= 1, jnp.asarray(-3.0, fl), pr)
