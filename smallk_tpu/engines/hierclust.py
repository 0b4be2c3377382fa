"""Hierarchical clustering via recursive Rank-2 NMF (HierNMF2).

Reference: hierclust/include/clust_hier_generic.hpp (ClustHier :77-238,
TrialSplit :245-376, ActualSplit :383-517), hierclust/src/clust.cpp
(RunClust), hierclust/include/clust_flat_generic.hpp (ClustFlat).

TPU-native redesign (SURVEY.md §7.3 "dynamic shapes in hierclust"):
the reference physically extracts each node's column subset with
row-compaction (A.SubMatrixColsCompact).  Here every node factorization
runs on the FULL-shape operand wrapped in a column mask (ops.aop.MaskedAOp)
— masking commutes with the two products, zero columns/rows behave exactly
like removed ones, and XLA compiles ONE rank-2 solve loop reused for every
node in the tree (no per-node recompilation, no dynamic shapes).  Tree
bookkeeping, NDCG priorities, and doc partitioning are host-side numpy.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..common.options import ClustOptions, ClustStats
from ..common.rng import Random, random_matrix
from ..io.delimited import load_delimited
from ..ops.aop import DenseAOp, MaskedAOp, as_aop
from ..solvers.solve import nmf_solve
from .priority import compute_priority
from .tree import Tree


class _InitializerSource:
    """W/H initializers for each factorization, in consumption order.

    Random by default; with `initdir`, loads Winit_N.csv / Hinit_N.csv in
    factorization order for deterministic testing (reference
    LoadInitializers, clust_hier_generic.hpp:568-622).
    """

    def __init__(self, m, n, rng: Random, initdir=None, dtype=np.float64):
        self.m, self.n = m, n
        self.rng = rng
        self.initdir = initdir
        self.counter = 1
        self.dtype = dtype

    def next(self):
        if self.initdir:
            W = load_delimited(
                f"{self.initdir.rstrip('/')}/Winit_{self.counter}.csv",
                dtype=self.dtype,
            )
            H = load_delimited(
                f"{self.initdir.rstrip('/')}/Hinit_{self.counter}.csv",
                dtype=self.dtype,
            )
            self.counter += 1
            if W.shape != (self.m, 2) or H.shape != (2, self.n):
                raise ValueError(
                    f"initializer {self.counter - 1} has wrong shape"
                )
            return W, H
        W = random_matrix(self.m, 2, self.rng, dtype=self.dtype)
        H = random_matrix(2, self.n, self.rng, dtype=self.dtype)
        return W, H


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


_MIN_BUCKET = 512

# Sibling-pair batched solves: a win only where the solve is
# latency-bound AND sibling iteration counts are balanced — the vmapped
# pair runs 2 x max(sibling iterations).  Module knob for benchmarking.
PAIR_BATCHING = True


class _Rank2Runner:
    """Runs per-node rank-2 factorizations on device with retry ladder.

    TPU shape strategy: a node's column subset is factored on a
    power-of-2-bucketed slice of A gathered ON DEVICE (A columns at the
    subset indices, zero-padded to the bucket width).  This restores the
    reference's cost scaling — deep (small) nodes are cheap — while
    compiling only one solve loop per bucket width and never shipping
    matrix data back through the host (the reference instead extracts
    compacted host submatrices per node, clust_hier_generic.hpp:424).
    Zero pad columns are mathematically identical to the reference's
    removed columns for every solver quantity.  Subsets wider than half
    of A (and all sparse operands) use the column-mask formulation on the
    full shape instead.
    """

    def __init__(self, a_op, opts: ClustOptions, inits: _InitializerSource,
                 stats: ClustStats, dtype, mesh=None):
        self.a_op = a_op
        self.opts = opts
        self.inits = inits
        self.stats = stats
        self.dtype = dtype
        self.mesh = mesh
        m, n = a_op.shape
        self.m, self.n = m, n
        self._A_ext = None  # dense A with one trailing zero column
        if isinstance(a_op, DenseAOp) and mesh is None:
            # single-device fast path: per-node bucketed column gathers.
            # Under a mesh, nodes run as sharded column MASKS on the
            # full-shape operand instead — masking commutes with both
            # products and keeps A sharded exactly once (SURVEY §5.8).
            self._A_ext = jnp.concatenate(
                [a_op.A, jnp.zeros((m, 1), a_op.A.dtype)], axis=1
            )

    def _gathered_op(self, subset, n_b):
        """DenseAOp over A[:, subset] zero-padded to n_b columns."""
        idx = np.full(n_b, self.n, dtype=np.int32)  # pad -> zero column
        idx[: len(subset)] = subset
        cols = jnp.take(self._A_ext, jnp.asarray(idx), axis=1)
        return DenseAOp(cols)

    def solve_pair(self, subset_l, subset_r):
        """Factor the two children of a split as ONE batched solve.

        Siblings partition the same parent and typically need similar
        iteration counts; vmapping the (done-gated, see solvers/solve.py)
        solve loop over the stacked pair halves dispatch count and doubles
        chip utilization on the latency-bound small widths.  Returns
        [(W, H_subset, ok), (W, H_subset, ok)] or None when ineligible
        (tiny subsets, initdir mode — its file-consumption order is
        defined by the sequential reference flow — or non-dense A).
        """
        if (not PAIR_BATCHING or self._A_ext is None or self.inits.initdir
                or len(subset_l) <= 3 or len(subset_r) <= 3):
            return None
        n_b = max(
            _MIN_BUCKET,
            _next_pow2(max(len(subset_l), len(subset_r))),
        )
        # batched cost is 2 x max(sibling iterations): a win only where
        # the solve is latency-bound (small widths underutilize the chip);
        # at large widths sibling iteration imbalance makes it a loss
        if n_b >= self.n or n_b > 2 * _MIN_BUCKET:
            return None

        import jax

        from ..solvers.solve import _nmf_solve_impl

        subsets = (np.asarray(subset_l), np.asarray(subset_r))
        idx = np.full((2, n_b), self.n, dtype=np.int32)
        for i, s in enumerate(subsets):
            idx[i, : len(s)] = s
        A_pair = jnp.transpose(
            jnp.take(self._A_ext, jnp.asarray(idx.reshape(-1)), axis=1)
            .reshape(self.m, 2, n_b),
            (1, 0, 2),
        )  # (2, m, n_b)

        W0s = np.empty((2, self.m, 2))
        H0s = np.zeros((2, 2, n_b))
        for i, s in enumerate(subsets):
            W0, H0 = self.inits.next()
            W0s[i] = W0
            H0s[i, :, : len(s)] = H0[:, s]

        nmf_opts = self.opts.nmf_opts
        spectral = self.opts.init_method == "spectral"

        def one(A, W0, H0):
            op = DenseAOp(A)
            pg0 = None
            if spectral:
                from ..solvers.rank2 import spectral_init_rank2
                from ..solvers.solve import reference_pg1

                # tolerance stays anchored to the random-start PG_1 scale
                pg0 = reference_pg1(op, W0, H0, nmf_opts)
                W0, H0 = spectral_init_rank2(op, H0)
            return _nmf_solve_impl(op, W0, H0, nmf_opts, False, pg0)

        res = jax.vmap(one)(
            A_pair, jnp.asarray(W0s, self.dtype), jnp.asarray(H0s, self.dtype)
        )

        out = []
        for i, s in enumerate(subsets):
            if bool(res.success[i]):
                self.stats.nmf_count += 1
                if int(res.iterations[i]) >= nmf_opts.max_iter:
                    self.stats.max_count += 1
                out.append((
                    np.asarray(res.W[i]),
                    np.asarray(res.H[i])[:, : len(s)],
                    True,
                ))
            else:
                # rare singular failure: retry ladder takes over serially
                out.append(self.solve(s))
        return out

    def solve(self, subset=None, max_attempts=3):
        """Factor A[:, subset] (full A when subset is None).

        Returns (W (m,2), H_subset (2,|subset|), success).  Retries with
        fresh initializers up to `max_attempts` times on solver failure
        (singular system), mirroring clust_hier_generic.hpp:123-151,435-472.
        """
        nmf_opts = self.opts.nmf_opts
        bucket = None
        if subset is None:
            a_op = self.a_op
        else:
            n_b = max(_MIN_BUCKET, _next_pow2(len(subset)))
            if self._A_ext is not None and n_b < self.n:
                bucket = n_b
                a_op = self._gathered_op(subset, n_b)
            else:
                mask = np.zeros(self.n, dtype=self.dtype)
                mask[subset] = 1.0
                mask_dev = jnp.asarray(mask)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    import jax

                    mask_dev = jax.device_put(
                        mask_dev,
                        NamedSharding(self.mesh,
                                      P(self.mesh.axis_names[1])),
                    )
                a_op = MaskedAOp(self.a_op, mask_dev)

        for attempt in range(max_attempts):
            W0, H0 = self.inits.next()
            if bucket is not None:
                H0b = np.zeros((2, bucket), dtype=H0.dtype)
                H0b[:, : len(subset)] = H0[:, subset]
                H0 = H0b
            W0 = jnp.asarray(W0, self.dtype)
            H0 = jnp.asarray(H0, self.dtype)
            if self.mesh is not None:
                from ..parallel.mesh import shard_factors

                try:
                    W0, H0 = shard_factors(W0, H0, self.mesh)
                except ValueError:
                    pass  # uneven shapes: GSPMD reshards from replicated
            pg0 = None
            # spectral init on the first attempt only: retries mean the
            # spectral start failed (degenerate second singular pair) and
            # the reference's random restart is the escape hatch
            if (attempt == 0 and not self.inits.initdir
                    and self.opts.init_method == "spectral"):
                from ..solvers.rank2 import spectral_init_rank2
                from ..solvers.solve import reference_pg1

                W0s, H0s = spectral_init_rank2(a_op, H0)
                if bool(jnp.all(jnp.isfinite(W0s))
                        & (jnp.linalg.norm(W0s, axis=0) > 0).all()):
                    # tolerance anchored to the random-start PG_1 scale
                    pg0 = reference_pg1(a_op, W0, H0, nmf_opts)
                    W0, H0 = W0s, H0s
            res = nmf_solve(
                a_op,
                W0,
                H0,
                nmf_opts,
                pg0_hint=pg0,
            )
            if bool(res.success):
                self.stats.nmf_count += 1
                if int(res.iterations) >= nmf_opts.max_iter:
                    self.stats.max_count += 1
                W = np.asarray(res.W)
                H = np.asarray(res.H)
                if subset is None:
                    H_out = H
                elif bucket is not None:
                    H_out = H[:, : len(subset)]
                else:
                    H_out = H[:, subset]
                return W, H_out, True
            if self.opts.verbose:
                print("\nNode factorization failed, retrying with new "
                      "initializers...")
        return None, None, False


def _actual_split(runner: _Rank2Runner, subset, w_parent,
                  precomputed=None):
    """One split attempt on a column subset.

    Reference: ActualSplit (clust_hier_generic.hpp:383-517).
    Returns (priority, W (m,2), H (2,|subset|), labels (|subset|,)).
    `precomputed` carries a (W, H, ok) result from a batched pair solve.
    """
    m = runner.m
    if len(subset) <= 3:
        labels = np.ones(len(subset), dtype=np.int64)
        return -1.0, np.zeros((m, 2)), np.zeros((2, len(subset))), labels

    if precomputed is not None:
        W, H, ok = precomputed
    else:
        W, H, ok = runner.solve(subset)
    if not ok:
        raise RuntimeError(
            "HierNMF2: node factorization failed after three attempts."
        )

    labels = np.where(H[0, :] > H[1, :], 0, 1).astype(np.int64)
    has_0 = bool((labels == 0).any())
    has_1 = bool((labels == 1).any())

    priority = -1.0
    if has_0 and has_1:
        priority = compute_priority(w_parent, W)
    return priority, W, H, labels


def _trial_split(runner: _Rank2Runner, subset, min_priority, w_parent,
                 opts: ClustOptions, first=None):
    """Split with outlier detection and retries.

    Reference: TrialSplit (clust_hier_generic.hpp:245-376).  May shrink
    `subset` by dropping outlier items; on exhausting trial_allowance the
    node becomes a permanent leaf (priority -2) with its original docs.
    Returns (priority, subset, W, H).
    """
    subset = np.asarray(subset, dtype=np.int64)
    subset_backup = subset.copy()
    subset_small = np.empty(0, dtype=np.int64)

    trial = 0
    priority_one = -2.0
    W = H = None
    while trial < opts.trial_allowance:
        priority_one, W, H, labels = _actual_split(
            runner, subset, w_parent, precomputed=first
        )
        first = None  # only valid for the untouched initial subset
        if priority_one < 0:
            break

        counts = np.bincount(labels, minlength=2)
        smallest_size = int(counts.min())
        if smallest_size < opts.unbalanced * len(labels):
            label_small = 0 if smallest_size == counts[0] else 1
            subset_small = subset[labels == label_small]

            # score the small cluster on its own; its parent topic vector is
            # the corresponding column of this split's W
            pr_small, _, _, _ = _actual_split(
                runner, subset_small, W[:, label_small]
            )
            if pr_small < min_priority:
                trial += 1
                if trial < opts.trial_allowance:
                    if opts.verbose:
                        print(f"dropping {len(subset_small)} items ...")
                    subset = np.setdiff1d(subset, subset_small)
            else:
                break
        else:
            break

    if trial == opts.trial_allowance:
        # exhausted all attempts: permanent leaf with original docs
        if opts.verbose:
            print(f"recycling {len(subset_small)} items ...")
        subset = subset_backup
        W = np.zeros((runner.m, 2))
        H = np.zeros((2, len(subset)))
        priority_one = -2.0

    return priority_one, subset, W, H


def _save_hier_checkpoint(path, tree, W_buffer, H_buffer, rng, stats,
                          i_next, root_W=None, root_H=None):
    """Atomic npz checkpoint of the full hierclust state (SURVEY §5.4:
    'checkpoint = (W, H, iteration, RNG key, tree state)' — new scope
    beyond the reference, which has no checkpointing)."""
    import os
    import pickle
    import tempfile

    payload = dict(tree.to_arrays())
    payload["i_next"] = np.int64(i_next)
    payload["nmf_count"] = np.int64(stats.nmf_count)
    payload["max_count"] = np.int64(stats.max_count)
    payload["rng_state"] = np.frombuffer(
        pickle.dumps(rng.get_state()), dtype=np.uint8
    )
    for idx, (Wb, Hb) in enumerate(zip(W_buffer, H_buffer)):
        if Wb is not None:
            payload[f"Wbuf_{idx}"] = Wb
            payload[f"Hbuf_{idx}"] = Hb
    if root_W is not None:
        payload["root_W"] = root_W
        payload["root_H"] = root_H

    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".hckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _load_hier_checkpoint(path, node_count):
    import pickle

    with np.load(path, allow_pickle=False) as z:
        arrs = {k: z[k] for k in z.files}
    tree = Tree.from_arrays(arrs)
    W_buffer = [None] * node_count
    H_buffer = [None] * node_count
    for idx in range(node_count):
        if f"Wbuf_{idx}" in arrs:
            W_buffer[idx] = arrs[f"Wbuf_{idx}"]
            H_buffer[idx] = arrs[f"Hbuf_{idx}"]
    rng_state = pickle.loads(bytes(arrs["rng_state"]))
    root = (arrs.get("root_W"), arrs.get("root_H"))
    return (tree, W_buffer, H_buffer, rng_state, int(arrs["i_next"]),
            int(arrs["nmf_count"]), int(arrs["max_count"]), root)


def clust_hier(A, opts: ClustOptions, rng: Random,
               stats: ClustStats | None = None,
               checkpoint_path: str | None = None,
               mesh=None,
               _interrupt_after: int | None = None):
    """Build the hierarchical clustering tree.

    Reference: ClustHier (clust_hier_generic.hpp:77-238).
    Returns (tree, stats).

    With `checkpoint_path`, the full engine state (tree, per-node factor
    buffers, RNG stream, split counter) is checkpointed after the root
    factorization and after every split; an existing checkpoint resumes
    the run preemption-safely.  `_interrupt_after` is a test hook that
    raises after N completed splits.

    With `mesh` (a jax.sharding.Mesh over (terms, docs)): A is sharded
    ONCE across the mesh and every node factorization runs as a sharded
    column mask on the full-shape operand — GSPMD inserts the Gram psums
    and contracted-product collectives per SURVEY §5.8; node subsets never
    leave the devices.  This is the distributed hierclust the reference
    lists as future work (pages_introduction.rst:78).
    """
    import os

    stats = stats if stats is not None else ClustStats()
    opts.validate()
    dtype = jnp.dtype(opts.nmf_opts.dtype)
    a_op = as_aop(A, dtype=jnp.dtype(opts.nmf_opts.a_dtype or
                                     opts.nmf_opts.dtype))
    if mesh is not None:
        from ..parallel.mesh import shard_operand

        a_op = shard_operand(a_op, mesh)
    m, n = a_op.shape

    num_clusters = opts.num_clusters
    node_count = 2 * (num_clusters - 1)

    inits = _InitializerSource(m, n, rng, opts.initdir, dtype=np.float64)
    runner = _Rank2Runner(a_op, opts, inits, stats, dtype, mesh=mesh)

    W = H = None
    start_i = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        (tree, W_buffer, H_buffer, rng_state, start_i,
         stats.nmf_count, stats.max_count, root) = _load_hier_checkpoint(
            checkpoint_path, node_count
        )
        rng.set_state(rng_state)
        if start_i == 0:
            W, H = root
    else:
        tree = Tree()
        tree.init(num_clusters, node_count, m, n)

        # factor the root (<= 3 attempts)
        W, H, ok = runner.solve(None)
        if not ok:
            raise RuntimeError(
                "HierNMF2: root node factorization failed after three "
                "attempts"
            )

        W_buffer = [None] * node_count
        H_buffer = [None] * node_count
        if checkpoint_path:
            _save_hier_checkpoint(
                checkpoint_path, tree, W_buffer, H_buffer, rng, stats, 0,
                root_W=W, root_H=H,
            )

    split_index = 0

    for i in range(start_i, num_clusters - 1):
        if i == 0:
            min_priority = np.inf
            tree.split_root(W, H)
        else:
            min_priority, max_priority, split_index = (
                tree.min_max_leaf_priorities()
            )
            if max_priority < 0:
                if opts.verbose:
                    print("\nHierNMF2: no further factorization possible.\n")
                break
            W = W_buffer[split_index]
            H = H_buffer[split_index]
            tree.split(split_index, W, H)

        # factor both children; eligible pairs run as one batched solve
        pair = runner.solve_pair(tree.left_child_docs(),
                                 tree.right_child_docs())
        for slot, (idx, docs_fn, tv_fn) in enumerate((
            (tree.index0, tree.left_child_docs, tree.left_child_topic_vector),
            (tree.index1, tree.right_child_docs,
             tree.right_child_topic_vector),
        )):
            priority, subset, W_c, H_c = _trial_split(
                runner, docs_fn(), min_priority, tv_fn(), opts,
                first=None if pair is None else pair[slot],
            )
            tree.nodes[idx].docs = subset  # TrialSplit may drop outliers
            tree.set_node_priority(idx, priority)
            W_buffer[idx] = W_c
            H_buffer[idx] = H_c

        if opts.verbose:
            print(f"[{i + 1}] ", end="", flush=True)

        if checkpoint_path:
            _save_hier_checkpoint(
                checkpoint_path, tree, W_buffer, H_buffer, rng, stats,
                i + 1,
            )
        if _interrupt_after is not None and (i + 1) >= _interrupt_after:
            raise KeyboardInterrupt(
                f"test interrupt after {i + 1} splits"
            )

    tree.compute_top_terms(opts.maxterms)
    tree.compute_assignments()
    if opts.verbose:
        print()
    return tree, stats


def clust_flat(A, tree: Tree, opts: ClustOptions, rng: Random, mesh=None):
    """Flat refinement: W from the k leaf topic vectors, H by NNLS-HALS.

    Reference: ClustFlat (clust_flat_generic.hpp:15-76), <= 3 attempts with
    fresh random H.  Returns (W (m,k), H (k,n), success).
    `mesh` shards A over the (terms, docs) mesh for the refinement solve.
    """
    from ..solvers.nnls import nnls_hals

    dtype = jnp.dtype(opts.nmf_opts.dtype)
    a_op = as_aop(A, dtype=jnp.dtype(opts.nmf_opts.a_dtype or
                                     opts.nmf_opts.dtype))
    if mesh is not None:
        from ..parallel.mesh import shard_operand

        a_op = shard_operand(a_op, mesh)
    m, n = a_op.shape
    k = opts.num_clusters

    W = tree.flatclust_init_w(m, k)
    W_dev = jnp.asarray(W, dtype)

    for _ in range(3):
        H0 = random_matrix(k, n, rng, dtype=np.float64)
        W_out, H_out, ok = nnls_hals(
            a_op, W_dev, jnp.asarray(H0, dtype),
            opts.nmf_opts.tol, opts.nmf_opts.max_iter,
        )
        if bool(ok):
            return np.asarray(W_out), np.asarray(H_out), True
    print("Flatclust NNLS solver failed after 3 attempts.")
    return np.asarray(W_out), np.asarray(H_out), False
