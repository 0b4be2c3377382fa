"""Hierarchical clustering via recursive Rank-2 NMF (HierNMF2).

Reference: hierclust/include/clust_hier_generic.hpp (ClustHier :77-238,
TrialSplit :245-376, ActualSplit :383-517), hierclust/src/clust.cpp
(RunClust), hierclust/include/clust_flat_generic.hpp (ClustFlat).

TPU-native redesign (SURVEY.md §7.3 "dynamic shapes in hierclust"):
the reference physically extracts each node's column subset with
row-compaction (A.SubMatrixColsCompact).  Here every node factorization
runs on a power-of-2-bucketed on-device gather of A's subset columns (or a
column mask on the full shape for sparse/mesh operands) — masking/zero
padding commutes with the two products, and XLA compiles ONE rank-2 solve
loop per bucket width reused across the tree.

Device-resident tree loop: each node runs as ONE fused jitted program
(gather + initializer draw + solve loop + split labels + NDCG priority);
the host fetches a single small packed vector per node and never sees W/H
until the final top-terms ranking.  On hardware reached through a
high-latency link, per-node W/H round trips would otherwise dominate the
whole wall clock (measured: 57 ms d2h vs 28 ms solve per node through the
dev tunnel).  Tree bookkeeping and doc partitioning are host-side numpy.
"""

from __future__ import annotations

import functools
import threading
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..common.options import ClustOptions, ClustStats
from ..common.rng import Random, random_matrix
from ..io.delimited import load_delimited
from ..ops.aop import DenseAOp, MaskedAOp, as_aop
from ..solvers.solve import _nmf_solve_impl, nmf_solve, reference_pg1
from .priority import compute_priority, compute_priority_device
from .tree import DeviceColumn, SlabPair, Tree


class _InitializerSource:
    """W/H initializers for each factorization, in consumption order.

    Random by default; with `initdir`, loads Winit_N.csv / Hinit_N.csv in
    factorization order for deterministic testing (reference
    LoadInitializers, clust_hier_generic.hpp:568-622).

    In random mode the engine draws initializers ON DEVICE (threefry,
    inside the fused node program) and only consumes a 31-bit key seed
    from the host stream per factorization — determinism under the host
    seed and checkpointed RNG state is preserved with zero h2d traffic.
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

    def next_seed(self):
        """31-bit device-PRNG seed for one factorization (advances the
        stream).  The fused node program builds the threefry key from
        this scalar on device — shipping the raw int avoids the 2-3
        host-side device ops (key build + stack) per node that a
        PRNGKey argument would cost through a high-latency link."""
        return self.rng.device_key_seed()


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


_MIN_BUCKET = 512

# Bucket ladder: powers of 2 up to 4096, then multiples of 2048.
# Pure pow-2 wastes up to 2x in zero-pad columns exactly where the
# per-iteration cost is bandwidth-proportional (scripts/tpu_batch36:
# 0.155 -> 3.49 ms/iter from width 512 to 8192, no latency floor), so
# the wide end of the ladder is finer: a 5600-doc child solves at 6144
# instead of 8192 (-25% bytes).  The ladder is shared by the sequential
# engine and the chain so both pick identical widths for identical
# subsets (bit parity).
_BUCKET_STEP = 2048


def _ladder_iter():
    """The shared bucket ladder: pow2 to 4096, then 2048 steps, then —
    above 16384 — geometric ~12.5% steps rounded to 2048.  Identical to
    the round-4 ladder below 16384 (the measured 12c/20news regime,
    tpu_batch53); the relative steps above it bound zero-pad waste at
    12.5% while cutting the number of DISTINCT compiled widths a
    100k+-doc run touches (each unique width compiles one fused solve
    program — at 2048 steps a 250k-doc tree paid ~60 compiles)."""
    w = _MIN_BUCKET
    while w < 4096:
        yield w
        w <<= 1
    while True:
        yield w
        w += _BUCKET_STEP * max(1, w // (8 * _BUCKET_STEP))


def _bucket_widths(n: int, cap: int = 1 << 30):
    """All compiled bucket widths strictly below n (ascending)."""
    out = []
    for w in _ladder_iter():
        if w >= n or w > cap:
            break
        out.append(w)
    return tuple(out)


def _bucket_for(size: int) -> int:
    """Smallest ladder width >= size."""
    for w in _ladder_iter():
        if w >= size:
            return w

# Sibling-pair batched solves: a win where the solve is latency-bound
# (thin widths underutilize the chip) — the vmapped pair runs
# 2 x max(sibling iterations).  Module knob for benchmarking.
PAIR_BATCHING = True

# Speculative dispatch of the predicted next pops' pair solves (hides
# their device execution inside the current split's result-fetch round
# trip; measured 90-100% depth-1 and 87-99% depth-2 pop predictability,
# scripts/spec_hitrate{,2}.py).  Bit-identical to the sequential
# schedule by construction — see the speculation block in _Rank2Runner.
# Module knobs for benchmarking.
#
# Depth is adaptive on operand size (scripts/tpu_batch22 ablation):
# deeper speculation wins only while the pair solves are cheap relative
# to the ~26 ms tunnel round trip — 12411x7984 12c: d3 0.396 s vs d1
# 0.426 s; 12411x15968 100 leaves: d3 1.85 s vs d1 2.39 s — and LOSES
# once the device is the bottleneck, where mispredicted solves cost real
# execution time (39727x11237 15c: d3 1.55 s vs d1 1.23 s).  Operands
# at or above SPEC_DEVICE_BOUND elements therefore cap the stack at
# depth 1
# (the depth-1 dispatch overlaps the in-flight fetch either way).
SPECULATE = True
SPEC_DEPTH = 3       # max pops ahead to keep in flight
SPEC_PREFETCH = True  # background-thread fetch of speculative results
SPEC_ADAPTIVE = True  # cap depth at 1 on device-bound operand sizes
SPEC_DEVICE_BOUND = 3.0e8  # m*n elements above which solves dominate RTT


class _NodeSolve(NamedTuple):
    """One node factorization result.  W/H stay on device; `left` is the
    fetched boolean split mask aligned to the subset's doc order;
    `priority` already encodes the reference's gates (-1 when one side is
    empty, -3 on a degenerate parent topic)."""

    W: object
    H: object
    left: Optional[np.ndarray]
    priority: float
    ok: bool


def _solve_from_draw(op, valid, draw, root, w_parent, opts, init,
                     restarts):
    """THE shared node-solve body: initializer draw(s) + (optional
    spectral start) + solve loop + split labels + gated NDCG priority.

    Every device path — the sequential fused gather/mask programs here
    AND the multi-split chain's per-step solves (engines/hier_chain.py)
    — traces THIS function, so both compile the same solve computation
    (they can still fuse differently inside scan/switch, but there is a
    single source of truth for the arithmetic).

    `draw(key) -> (W0, H0)` is the path-specific initializer closure
    (gathered vs full-width H); `root` the PRNGKey.  With restarts > 1
    all R random starts run as ONE vmapped solve and the restart with
    the lowest rank-2 reconstruction objective wins; the objective is
    ||A_sub - WH||_F^2 up to the constant ||A_sub||^2:
    tr((W'W)(HH')) - 2 <W'A, H>.  Failed restarts score +inf; the node
    fails only if every restart fails (then the reference's retry
    ladder takes over on the host).

    Returns (W, H, success, iterations, priority, left).
    """
    from ..solvers.rank2 import spectral_init_rank2

    if restarts == 1:
        W0, H0 = draw(root)
        pg0 = None
        # (a "parent" warm start — both W0 columns near the parent topic
        # vector — was measured and MAKES ITERATION COUNTS WORSE: the
        # true solution is parent +- the split direction, so a
        # parent-cone start is near-collinear and ill-conditions W'W.
        # The principled version of that idea is exactly the spectral
        # option below, which finds the split direction as the second
        # singular vector.)
        if init == "spectral":
            # tolerance stays anchored to the random-start PG_1 scale; a
            # degenerate spectral pair falls back to the random start
            pg0 = reference_pg1(op, W0, H0, opts)
            from ..solvers import rank2 as _rank2

            W0s, H0s = spectral_init_rank2(
                op, H0, power_iters=_rank2.SPECTRAL_POWER_ITERS)
            good = jnp.all(jnp.isfinite(W0s)) & jnp.all(
                jnp.linalg.norm(W0s, axis=0) > 0
            )
            W0 = jnp.where(good, W0s, W0)
            H0 = jnp.where(good, H0s, H0)
        res = _nmf_solve_impl(op, W0, H0, opts, False, pg0)
        Wb, Hb = res.W, res.H
        succ, iters = res.success, res.iterations
    else:
        W0s, H0s = jax.vmap(draw)(jax.random.split(root, restarts))
        res = jax.vmap(
            lambda w0, h0: _nmf_solve_impl(op, w0, h0, opts, False, None)
        )(W0s, H0s)

        def objective(W, H, ok):
            WtW = jnp.matmul(W.T, W)
            HHt = jnp.matmul(H, H.T)
            WtA = op.mm_tn(W)
            s = jnp.sum(WtW * HHt) - 2.0 * jnp.sum(WtA * H)
            return jnp.where(ok, s, jnp.asarray(jnp.inf, s.dtype))

        scores = jax.vmap(objective)(res.W, res.H, res.success)
        best = jnp.argmin(scores)  # ties -> lowest restart index
        Wb, Hb = res.W[best], res.H[best]
        succ = jnp.any(res.success)
        iters = res.iterations[best]

    left = Hb[0, :] > Hb[1, :]
    has0 = jnp.any(left & valid)
    has1 = jnp.any((~left) & valid)
    pr = compute_priority_device(w_parent, Wb)
    pr = jnp.where(has0 & has1, pr, jnp.asarray(-1.0, pr.dtype))
    return Wb, Hb, succ, iters, pr, left


def _pack_node_result(W, H, success, iterations, pr, left):
    """Sequential fused-program tail: pack the solve outcome for ONE
    small d2h fetch.

    Packed layout: [success, iterations, priority, left_0..left_{nb-1}].
    """
    # split labels ride the packed fetch as BITS (32 cols per f32 lane,
    # bitcast) — at bucket width 8192 that is a 1 KB fetch instead of
    # 32 KB, which matters at ~12 MB/s host<->device bandwidth
    pad = (-left.shape[0]) % 32
    lp = jnp.pad(left, (0, pad)) if pad else left
    bits = jnp.sum(
        lp.reshape(-1, 32).astype(jnp.uint32)
        << jnp.arange(32, dtype=jnp.uint32)[None, :],
        axis=1, dtype=jnp.uint32,
    )
    packed = jnp.concatenate([
        jnp.stack([
            success.astype(jnp.float32),
            iterations.astype(jnp.float32),
            pr.astype(jnp.float32),
        ]),
        jax.lax.bitcast_convert_type(bits, jnp.float32),
    ])
    return W, H, packed


def _unpack_left(ph_row: np.ndarray, count: int) -> np.ndarray:
    """Host-side inverse of the bit-packing in _pack_node_result: the f32
    lanes after the 3 scalars are bitcast uint32 words, LSB-first."""
    words = np.ascontiguousarray(ph_row[3:], dtype=np.float32)
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    return bits[:count].astype(bool)


def _gather_body(A_ext, idx, seed, w_parent, n_full, opts, init, fdtype,
                 restarts=1):
    m = A_ext.shape[0]
    cols = jnp.take(A_ext, idx, axis=1)  # pad idx == n_full -> zero column
    op = DenseAOp(cols)
    valid = idx < n_full

    # H is drawn at FULL width then gathered so the gather and mask paths
    # see identical initializer values on the subset columns (this is what
    # makes sharded-mesh trees equal single-device trees)
    def draw(key):
        kW, kH = jax.random.split(key)
        W0 = jax.random.uniform(kW, (m, 2), fdtype)
        Hf = jax.random.uniform(kH, (2, n_full), fdtype)
        H0 = jnp.take(Hf, idx, axis=1, mode="fill", fill_value=0)
        return W0, H0

    out = _solve_from_draw(op, valid, draw, jax.random.PRNGKey(seed),
                           w_parent, opts, init, restarts)
    return _pack_node_result(*out)


@functools.partial(
    jax.jit, static_argnames=("n_full", "opts", "init", "fdtype",
                              "restarts")
)
def _fused_gather_solve(A_ext, idx, seed, w_parent, n_full, opts, init,
                        fdtype, restarts=1):
    return _gather_body(A_ext, idx, seed, w_parent, n_full, opts, init,
                        fdtype, restarts)


@functools.partial(
    jax.jit, static_argnames=("n_full", "opts", "init", "fdtype",
                              "restarts")
)
def _fused_gather_pair(A_ext, idx2, seeds2, W_parent, n_full, opts,
                       init, fdtype, restarts=1):
    """Batched sibling solve (ONE dispatch through the link for both
    children).  `W_parent` is the parent node's (m, 2) factor buffer —
    column i is child i's parent topic vector — passed as ONE resident
    device array so the host never slices/stacks it.

    The sibling strategy mirrors the chain's (hier_chain
    SEQ_PAIR_MIN_ELEMS): at stream-bound bucket sizes the two solves
    run back to back (pays i0 + i1 iterations, and keeps this program
    structurally identical to the chain's branch so the two engines'
    f32 trajectories stay as close as XLA allows); below it the vmap
    batching wins on thin widths."""
    from .hier_chain import SEQ_PAIR_MIN_ELEMS

    m = A_ext.shape[0]
    solve = lambda idx, seed, wp: _gather_body(  # noqa: E731
        A_ext, idx, seed, wp, n_full, opts, init, fdtype, restarts
    )
    if m * idx2.shape[1] >= SEQ_PAIR_MIN_ELEMS:
        outs = [solve(idx2[i], seeds2[i], W_parent.T[i])
                for i in range(2)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    return jax.vmap(solve)(idx2, seeds2, W_parent.T)


def _chunk_body(chunks, idx_docs, idx_chunks, slot, seed, w_parent, wc,
                opts, init, fdtype, restarts=1):
    """Node solve on a chunk-gathered sparse column subset
    (ops/ell_cols.CscChunks — the TPU SubMatrixColsCompact).  Same
    structure as _gather_body: the initializer H is drawn at FULL width
    then gathered at idx_docs, so chunk, dense-gather, and mask paths
    see identical initializer values on the subset columns."""
    m, n_full = chunks.shape
    op = chunks.gathered(idx_chunks, slot, wc)
    valid = idx_docs < n_full

    def draw(key):
        kW, kH = jax.random.split(key)
        W0 = jax.random.uniform(kW, (m, 2), fdtype)
        Hf = jax.random.uniform(kH, (2, n_full), fdtype)
        H0 = jnp.take(Hf, idx_docs, axis=1, mode="fill", fill_value=0)
        return W0, H0

    out = _solve_from_draw(op, valid, draw, jax.random.PRNGKey(seed),
                           w_parent, opts, init, restarts)
    return _pack_node_result(*out)


@functools.partial(
    jax.jit, static_argnames=("wc", "opts", "init", "fdtype", "restarts")
)
def _fused_chunk_solve(chunks, idx_docs, idx_chunks, slot, seed,
                       w_parent, wc, opts, init, fdtype, restarts=1):
    return _chunk_body(chunks, idx_docs, idx_chunks, slot, seed,
                       w_parent, wc, opts, init, fdtype, restarts)


@functools.partial(
    jax.jit, static_argnames=("wc", "opts", "init", "fdtype", "restarts")
)
def _fused_chunk_pair(chunks, idx_docs2, idx_chunks2, slot2, seeds2,
                      W_parent, wc, opts, init, fdtype, restarts=1):
    """Batched sibling solve on chunk-gathered subsets (sparse analogue
    of _fused_gather_pair).  The stream-bound threshold counts gathered
    table entries (wc * L0) — the per-iteration bytes the products
    stream — against the same SEQ_PAIR_MIN_ELEMS boundary the dense
    path uses for m * width."""
    from .hier_chain import SEQ_PAIR_MIN_ELEMS

    solve = lambda idxd, idxc, sl, seed, wp: _chunk_body(  # noqa: E731
        chunks, idxd, idxc, sl, seed, wp, wc, opts, init, fdtype,
        restarts
    )
    if wc * chunks.L0 >= SEQ_PAIR_MIN_ELEMS:
        outs = [solve(idx_docs2[i], idx_chunks2[i], slot2[i], seeds2[i],
                      W_parent.T[i]) for i in range(2)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    return jax.vmap(solve)(idx_docs2, idx_chunks2, slot2, seeds2,
                           W_parent.T)


@functools.partial(jax.jit, static_argnames=("opts", "init", "fdtype",
                                             "restarts"))
def _fused_masked_solve(a_op, idx, seed, w_parent, opts, init, fdtype,
                        restarts=1):
    """Full-shape node solve: idx scatters a column mask (None == full A).
    Used for the root, wide subsets, sparse operands, and mesh runs (the
    mask's sharding follows A's via GSPMD, SURVEY §5.8)."""
    m, n = a_op.shape
    if idx is None:
        op = a_op
        valid = jnp.ones((n,), jnp.bool_)
    else:
        mask = jnp.zeros((n,), a_op.dtype).at[idx].set(1, mode="drop")
        valid = jnp.zeros((n,), jnp.bool_).at[idx].set(True, mode="drop")
        op = MaskedAOp(a_op, mask)

    def draw(key):
        kW, kH = jax.random.split(key)
        return (jax.random.uniform(kW, (m, 2), fdtype),
                jax.random.uniform(kH, (2, n), fdtype))

    out = _solve_from_draw(op, valid, draw, jax.random.PRNGKey(seed),
                           w_parent, opts, init, restarts)
    return _pack_node_result(*out)


@functools.partial(jax.jit, static_argnames=("m", "n", "fdtype"))
def _masked_draw(seed, m, n, fdtype):
    """EXACTLY the fused masked program's initializer draw (above) as a
    standalone dispatch — the segmented watchdog-safe path consumes it
    so its trajectory is bit-comparable to the one-shot program's."""
    kW, kH = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.uniform(kW, (m, 2), fdtype),
            jax.random.uniform(kH, (2, n), fdtype))


@jax.jit
def _pack_masked_result(W, H, valid, w_parent, success, iterations):
    """_solve_from_draw's label/priority tail for an externally-run
    solve (the segmented path), packed like _pack_node_result."""
    left = H[0, :] > H[1, :]
    has0 = jnp.any(left & valid)
    has1 = jnp.any((~left) & valid)
    pr = compute_priority_device(w_parent, W)
    pr = jnp.where(has0 & has1, pr, jnp.asarray(-1.0, pr.dtype))
    return _pack_node_result(W, H, success, iterations, pr, left)


class _PrefetchPool:
    """One background thread that turns device arrays into host arrays.

    Through a high-latency device link every synchronous fetch costs a
    full ~26 ms round trip (scripts/tpu_batch17.py); the pool starts the
    blocking transfer of a speculative result as soon as it is
    dispatched, so the main thread's later take() usually returns
    instantly.  Results are bit-identical to a synchronous np.asarray —
    only the schedule changes.  Worker exceptions surface on take()."""

    def __init__(self, workers=2):
        import queue

        self._q = queue.Queue()
        self._out = {}
        self._dropped = set()
        self._cv = threading.Condition()
        self._next_token = 0
        # one worker serializes round trips at ~26 ms/result — the same
        # rate the main thread would pay; SPEC_DEPTH concurrent workers
        # let the in-flight fetches' round trips overlap each other
        self._workers = workers
        self._threads = []

    def submit(self, arr):
        if not self._threads:
            for w in range(self._workers):
                th = threading.Thread(
                    target=self._run, name=f"smallk-prefetch-{w}",
                    daemon=True,
                )
                th.start()
                self._threads.append(th)
        tok = self._next_token
        self._next_token += 1
        self._q.put((tok, arr))
        return tok

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            tok, arr = item
            # skip fetches cancelled while queued: a dead transfer would
            # still cost its full round trip and serially delay every
            # live prefetch behind it
            with self._cv:
                if tok in self._dropped:
                    self._dropped.discard(tok)
                    continue
            try:
                res = np.asarray(arr)
            except BaseException as e:  # re-raised on take()
                res = e
            with self._cv:
                if tok in self._dropped:
                    self._dropped.discard(tok)
                else:
                    self._out[tok] = res
                self._cv.notify_all()

    def take(self, tok):
        with self._cv:
            while tok not in self._out:
                self._cv.wait()
            res = self._out.pop(tok)
        if isinstance(res, BaseException):
            raise res
        return res

    def drop(self, tok):
        """Forget a cancelled speculation's result (arrived or pending)."""
        with self._cv:
            if self._out.pop(tok, None) is None:
                self._dropped.add(tok)

    def close(self):
        for _ in self._threads:
            self._q.put(None)
        self._threads = []


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
                 stats: ClustStats, dtype, mesh=None, host_A=None):
        self.a_op = a_op
        self.opts = opts
        self.inits = inits
        self.stats = stats
        self.dtype = dtype
        self.mesh = mesh
        # host-side A (scipy/ndarray), initdir runs only: provides each
        # subset's row support for the reference's compacted-W0 semantics
        self.host_A = host_A
        self.init = opts.init_method
        # best-of-R restarts (ClustOptions.restarts); initdir runs are
        # pinned to the reference's one-start-per-file semantics
        self.restarts = 1 if inits.initdir else max(1, opts.restarts)
        # speculation stack: (node, pre-draw rng state, in-flight pair,
        # prefetch token), ordered by seed-draw time
        self._spec = []
        self._pool = None
        m, n = a_op.shape
        self.m, self.n = m, n
        # effective speculation depth for THIS operand (see module knobs)
        self.spec_depth = SPEC_DEPTH
        if SPEC_ADAPTIVE and m * n >= SPEC_DEVICE_BOUND:
            self.spec_depth = min(SPEC_DEPTH, 1)
        from .nmf import _dispatch_budget

        # watchdog-limited environments (see engines/nmf._dispatch_budget):
        # node solves whose one-shot fused program would run past the
        # budget are run in segments instead (_budget_segmented_masked)
        self._budget = _dispatch_budget()
        self._A_ext = None  # dense A with one trailing zero column
        self._A_chunks = None  # sparse chunk table (ops/ell_cols)
        if isinstance(a_op, DenseAOp) and mesh is None:
            # single-device fast path: per-node bucketed column gathers.
            # Under a mesh, nodes run as sharded column MASKS on the
            # full-shape operand instead — masking commutes with both
            # products and keeps A sharded exactly once (SURVEY §5.8).
            self._A_ext = jnp.concatenate(
                [a_op.A, jnp.zeros((m, 1), a_op.A.dtype)], axis=1
            )
        elif mesh is None and host_A is not None and not inits.initdir:
            import scipy.sparse as sp

            if sp.issparse(host_A):
                # sparse single-device fast path: chunk-expanded column
                # table -> per-node gathers scale with the subset's
                # NONZEROS (the reference's SubMatrixColsCompact
                # scaling, sparse_matrix_impl.hpp:479) instead of the
                # full-width masked products the mask path pays
                from ..ops.ell_cols import CscChunks

                self._A_chunks = CscChunks.from_scipy(
                    host_A, dtype=a_op.dtype)

    def _wp(self, w_parent):
        if w_parent is None:
            return jnp.zeros((self.m,), self.dtype)
        if isinstance(w_parent, DeviceColumn):
            w_parent = w_parent.materialize()
        return jnp.asarray(w_parent, self.dtype)

    def _padded_idx(self, subset, n_b):
        idx = np.full(n_b, self.n, dtype=np.int32)  # pad -> sentinel n
        idx[: len(subset)] = subset
        return jnp.asarray(idx)

    def _record(self, success, iterations):
        if success:
            self.stats.nmf_count += 1
            self.stats.iter_count += int(iterations)
            if iterations >= self.opts.nmf_opts.max_iter:
                self.stats.max_count += 1
        return success

    def should_segment_full(self) -> bool:
        """Would a one-shot full-width node solve risk the environment's
        dispatch watchdog?  True only with a configured budget, on the
        simple path (one random start — the segmented driver carries no
        restart batching or spectral start), when ~150 iterations of
        full-operand products already exceed half the budget.  150 is a
        typical-convergence scale, not max_iter: gating on the 5000-iter
        worst case would segment every big-but-fast solve (the measured
        12c/20news fused paths) for no benefit, while a genuinely huge
        operand blows the budget well before 150 iterations."""
        if (self._budget is None or self.restarts != 1
                or self.init != "random" or self.inits.initdir):
            return False
        est = (self.est_full_iter_seconds()
               * min(self.opts.nmf_opts.max_iter, 150))
        return est > 0.5 * self._budget

    def est_full_iter_seconds(self) -> float:
        """Modeled per-iteration device time of a FULL-width rank-2
        solve on this operand (the measured product-rate anchors of
        engines/nmf._est_iter_seconds, k=2 solve tier ~free)."""
        nnz = (getattr(self.a_op, "padded_nnz", None)
               or getattr(self.a_op, "nnz", None))
        if nnz is not None:
            return 2.0 * float(nnz) / 0.4e9
        return (2.0 * float(self.m) * float(self.n)
                * jnp.dtype(self.a_op.dtype).itemsize / 1e11)

    def _budget_segmented_masked(self, subset, seed, wp):
        """One node-solve attempt on the masked full-shape operand, run
        in dispatch-budget-sized segments (engines/nmf._run_segmented —
        exact stopping-criterion parity via the pg0 carry) instead of
        one long fused dispatch the environment watchdog could kill.
        Same initializer draw as the fused program (_masked_draw)."""
        from .nmf import _run_segmented

        n = self.n
        if subset is None:
            op = self.a_op
            valid = jnp.ones((n,), jnp.bool_)
        else:
            n_b = _bucket_for(len(subset))
            idx = self._padded_idx(subset, n_b)
            mask = jnp.zeros((n,), self.a_op.dtype).at[idx].set(
                1, mode="drop")
            valid = jnp.zeros((n,), jnp.bool_).at[idx].set(
                True, mode="drop")
            op = MaskedAOp(self.a_op, mask)
        from .hier_chain import _dbg

        _dbg(f"[seq] segmented masked solve subset="
             f"{'full' if subset is None else len(subset)}")
        W0, H0 = _masked_draw(int(seed), self.m, n, self.dtype)
        res = _run_segmented(op, W0, H0, self.opts.nmf_opts,
                             self._budget)
        return _pack_masked_result(res.W, res.H, valid, wp,
                                   res.success, res.iterations)

    def _chunk_bucket(self, subset):
        """Ladder width for a chunk-gathered subset solve, or None when
        the subset must use the full-width mask path.  The width covers
        BOTH the subset's chunk count and its doc count (empty columns
        occupy a doc slot but no chunk)."""
        if self._A_chunks is None:
            return None
        need = max(self._A_chunks.subset_chunk_count(subset),
                   len(subset))
        wc = _bucket_for(need)
        # wider than ~half the corpus's chunks: the masked full-width
        # products win on constants (see hier_chain._chain_widths)
        if 2 * wc >= self._A_chunks.C + 1:
            return None
        # under a dispatch budget, a one-shot fused chunk solve whose
        # worst case outruns the watchdog routes to the segmented
        # masked path instead (same rate model as _chain_widths)
        if self._budget is not None:
            iters = min(self.opts.nmf_opts.max_iter, 150)
            if iters * (wc * self._A_chunks.L0 / 4e7) > 0.5 * self._budget:
                return None
        return wc

    def _pair_eligible(self, subset_l, subset_r):
        """Bucket width for a batched sibling solve, or None when the
        pair must run serially (tiny subsets, initdir mode — its
        file-consumption order is defined by the sequential reference
        flow — or an operand with no gather fast path)."""
        if (not PAIR_BATCHING or self.inits.initdir
                or len(subset_l) <= 3 or len(subset_r) <= 3):
            return None
        if self._A_ext is not None:
            n_b = _bucket_for(max(len(subset_l), len(subset_r)))
            if n_b >= self.n:
                return None
            return n_b
        if self._A_chunks is not None:
            wl = self._chunk_bucket(subset_l)
            wr = self._chunk_bucket(subset_r)
            if wl is None or wr is None:
                return None
            return max(wl, wr)
        return None

    def _start_pair(self, subsets, n_b, W_parent):
        """Draw two initializer seeds and dispatch the fused pair program
        (async — nothing is fetched here).  Returns the in-flight state
        `_finish_pair` consumes."""
        if isinstance(W_parent, SlabPair):
            W_parent = W_parent.materialize()
        seeds = np.array(
            [self.inits.next_seed(), self.inits.next_seed()], np.int32
        )
        if self._A_ext is not None:
            idx = np.full((2, n_b), self.n, dtype=np.int32)
            for i, s in enumerate(subsets):
                idx[i, : len(s)] = s
            W_, H_, packed = _fused_gather_pair(
                self._A_ext, idx, seeds,
                jnp.asarray(W_parent, self.dtype),
                n_full=self.n, opts=self.opts.nmf_opts, init=self.init,
                fdtype=self.dtype, restarts=self.restarts,
            )
        else:
            plans = [self._A_chunks.gather_host(s, n_b) for s in subsets]
            idxd = jnp.asarray(np.stack([p[0] for p in plans]))
            idxc = jnp.asarray(np.stack([p[1] for p in plans]))
            slot = jnp.asarray(np.stack([p[2] for p in plans]))
            W_, H_, packed = _fused_chunk_pair(
                self._A_chunks, idxd, idxc, slot, seeds,
                jnp.asarray(W_parent, self.dtype), wc=n_b,
                opts=self.opts.nmf_opts, init=self.init,
                fdtype=self.dtype, restarts=self.restarts,
            )
        return (W_, H_, packed, subsets, W_parent)

    def dispatch_pair(self, subset_l, subset_r, W_parent):
        """Eligibility check + async dispatch (no fetch).  Cancels any
        outstanding speculation first so seed order stays sequential."""
        self._cancel_spec()
        n_b = self._pair_eligible(subset_l, subset_r)
        if n_b is None:
            return None
        return self._start_pair(
            (np.asarray(subset_l), np.asarray(subset_r)), n_b, W_parent
        )

    def finish_pair(self, inflight, token=None):
        """Block on the packed result of a dispatched pair and unpack it
        into two _NodeSolves (serial retry ladder on rare failures).
        `token`: prefetch-pool handle for speculative dispatches — the
        transfer started in the background when the pair was dispatched."""
        W_, H_, packed, subsets, W_parent = inflight
        if token is not None and self._pool is not None:
            ph = self._pool.take(token)  # (2, 3 + n_b/32)
        else:
            ph = np.asarray(packed)  # one fetch: (2, 3 + n_b/32)
        out = []
        for i, s in enumerate(subsets):
            if self._record(ph[i, 0] > 0.5, int(ph[i, 1])):
                left = _unpack_left(ph[i], len(s))
                out.append(
                    _NodeSolve(W_[i], H_[i], left, float(ph[i, 2]), True)
                )
            else:
                # rare singular failure: retry ladder takes over serially
                out.append(self.solve(s, W_parent[:, i]))
        return out

    def solve_pair(self, subset_l, subset_r, W_parent):
        """Factor the two children of a split as ONE batched fused solve.

        Siblings partition the same parent and typically need similar
        iteration counts; vmapping the (done-gated, see solvers/solve.py)
        solve loop over the stacked pair halves dispatch count and doubles
        chip utilization on the latency-bound thin widths.  `W_parent` is
        the split node's (m, 2) factor buffer (device-resident); its
        column i is child i's parent topic vector.  Returns
        [_NodeSolve, _NodeSolve] or None when ineligible.
        """
        inflight = self.dispatch_pair(subset_l, subset_r, W_parent)
        if inflight is None:
            return None
        return self.finish_pair(inflight)

    # --- speculative dispatch pipeline --------------------------------------
    #
    # The tree loop's only cross-split dependency is the priority pop,
    # and measured pop traces are highly predictable from the leaves
    # that already have final priorities: 90-100% one pop ahead and
    # 87-99% two ahead (scripts/spec_hitrate{,2}.py) — a freshly split
    # pair almost never outranks the best existing leaves.  So the loop
    # keeps a stack of runner.spec_depth predicted pops' pair solves in
    # flight (SPEC_DEPTH capped to 1 on device-bound operand sizes),
    # and a background thread (_PrefetchPool) starts each speculative
    # result's device->host transfer at dispatch time: by the time a
    # prediction is consumed, both its execution and its ~26 ms fetch
    # round trip have already overlapped earlier splits.  Determinism is
    # preserved exactly: the host RNG state is saved before each
    # speculative seed draw (stack entries in draw order), and any
    # deviation from the predicted sequential flow (pop mismatch, an
    # outlier-path serial solve, loop exit) rolls the stream back, so
    # the seed stream any CONSUMED solve sees is identical to the
    # unspeculated run's.  (The reference's flow is strictly sequential,
    # clust_hier_generic.hpp:77-238; this changes the schedule, never
    # the arithmetic.)

    def push_spec(self, node, subset_l, subset_r, W_parent):
        """Dispatch the pair solve for predicted pop `node` (async) and
        append it to the speculation stack.  Returns False when the pair
        is ineligible (nothing was dispatched or drawn)."""
        n_b = self._pair_eligible(subset_l, subset_r)
        if n_b is None:
            return False
        state = self.inits.rng.get_state()
        inflight = self._start_pair(
            (np.asarray(subset_l), np.asarray(subset_r)), n_b, W_parent
        )
        token = None
        if SPEC_PREFETCH:
            if self._pool is None:
                self._pool = _PrefetchPool(workers=max(2, self.spec_depth))
            token = self._pool.submit(inflight[2])  # packed vector
        self._spec.append((node, state, inflight, token))
        return True

    def spec_nodes(self):
        """Node indices currently speculated, in dispatch order."""
        return [entry[0] for entry in self._spec]

    def take_spec(self, node):
        """(inflight, prefetch token) for `node` if it heads the
        speculation stack; on a head miss ALL speculative seed draws are
        rolled back (deeper entries' seeds were drawn after the head's,
        so they cannot be kept) and None returns."""
        if self._spec and self._spec[0][0] == node:
            _, _, inflight, token = self._spec.pop(0)
            return inflight, token
        self._cancel_spec()
        return None

    def cancel_spec_from(self, k):
        """Roll back speculation stack entries k..end (restore the RNG
        to entry k's pre-draw state, drop their prefetches)."""
        if k < len(self._spec):
            self.inits.rng.set_state(self._spec[k][1])
            for entry in self._spec[k:]:
                if entry[3] is not None:
                    self._pool.drop(entry[3])
            del self._spec[k:]

    def _cancel_spec(self):
        self.cancel_spec_from(0)

    def spec_rng_state(self):
        """RNG state with any pending speculation rolled back — what a
        checkpoint must record so a resumed run redraws the same seeds."""
        if self._spec:
            return self._spec[0][1]
        return self.inits.rng.get_state()

    def close(self):
        """Roll back outstanding speculation and stop the prefetch
        thread.  clust_hier calls this on every exit path."""
        self._cancel_spec()
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def solve(self, subset=None, w_parent=None, max_attempts=3):
        """Factor A[:, subset] (full A when subset is None).

        Returns a _NodeSolve.  Retries with fresh initializers up to
        `max_attempts` times on solver failure (singular system),
        mirroring clust_hier_generic.hpp:123-151,435-472.
        """
        # a serial solve means the sequential flow deviated from the
        # speculated one — roll back the speculative seed draws first
        self._cancel_spec()
        if self.inits.initdir:
            return self._solve_hostinit(subset, w_parent, max_attempts)

        nmf_opts = self.opts.nmf_opts
        wp = self._wp(w_parent)
        for attempt in range(max_attempts):
            seed = np.int32(self.inits.next_seed())
            # spectral/parent start on the first attempt only: a retry
            # means that basin failed and the reference's random restart
            # is the escape hatch
            init = self.init if attempt == 0 else "random"
            if subset is None:
                if self.should_segment_full():
                    W_, H_, packed = self._budget_segmented_masked(
                        None, seed, wp)
                else:
                    W_, H_, packed = _fused_masked_solve(
                        self.a_op, None, seed, wp,
                        opts=nmf_opts, init=init, fdtype=self.dtype,
                        restarts=self.restarts,
                    )
                count, sel = self.n, slice(None)
            else:
                n_b = _bucket_for(len(subset))
                wc = self._chunk_bucket(subset)
                from .hier_chain import _dbg as _dbg2
                _dbg2(f"[seq] solve subset={len(subset)} n_b={n_b} "
                      f"wc={wc} tier="
                      + ("gather" if (self._A_ext is not None
                                      and n_b < self.n) else
                         ("chunk" if wc is not None else "masked")))
                if self._A_ext is not None and n_b < self.n:
                    W_, H_, packed = _fused_gather_solve(
                        self._A_ext, self._padded_idx(subset, n_b), seed,
                        wp, n_full=self.n, opts=nmf_opts, init=init,
                        fdtype=self.dtype, restarts=self.restarts,
                    )
                    count, sel = n_b, slice(0, len(subset))
                elif wc is not None:
                    # sparse fast path: chunk-gathered subset operand
                    # (cost ~ subset nonzeros, not full width)
                    idxd, idxc, slot = self._A_chunks.gather_host(
                        subset, wc)
                    W_, H_, packed = _fused_chunk_solve(
                        self._A_chunks, jnp.asarray(idxd),
                        jnp.asarray(idxc), jnp.asarray(slot), seed, wp,
                        wc=wc, opts=nmf_opts, init=init,
                        fdtype=self.dtype, restarts=self.restarts,
                    )
                    count, sel = wc, slice(0, len(subset))
                elif self.should_segment_full():
                    W_, H_, packed = self._budget_segmented_masked(
                        subset, seed, wp)
                    count, sel = self.n, np.asarray(subset)
                else:
                    # bucket the scatter width like the gather path, or
                    # every distinct subset size would retrace (and
                    # recompile) the whole fused solve program
                    W_, H_, packed = _fused_masked_solve(
                        self.a_op, self._padded_idx(subset, n_b), seed, wp,
                        opts=nmf_opts, init=init, fdtype=self.dtype,
                        restarts=self.restarts,
                    )
                    count, sel = self.n, np.asarray(subset)
            ph = np.asarray(packed)
            if self._record(ph[0] > 0.5, int(ph[1])):
                left = _unpack_left(ph, count)[sel]
                return _NodeSolve(W_, H_, left, float(ph[2]), True)
            if self.opts.verbose:
                print("\nNode factorization failed, retrying with new "
                      "initializers...")
        return _NodeSolve(None, None, None, -1.0, False)

    def _solve_hostinit(self, subset, w_parent, max_attempts):
        """initdir parity path: host-loaded initializers, host priority
        (f64 reference transcription), sequential file consumption.

        The reference extracts a row-COMPACTED W initializer per node
        (ActualSplit -> ExtractSubmatrices via new_to_old_rows,
        clust_hier_generic.hpp:440-452): rows of A[:, subset] with no
        nonzeros contribute nothing to the compacted solve.  The
        full-shape equivalent is zeroing W0 at those rows — W'W/W'A then
        match the compacted Grams exactly, and the rank-2 W update keeps
        off-support rows at exact zero (AH' rows are zero), so the whole
        trajectory equals the reference's compact solve scattered back."""
        nmf_opts = self.opts.nmf_opts
        bucket = None
        row_support = None
        if subset is not None and self.host_A is not None:
            import scipy.sparse as sp

            sub = self.host_A[:, np.asarray(subset)]
            if sp.issparse(sub):
                nz_rows = np.unique(sub.tocoo().row)
                row_support = np.zeros(self.m, dtype=bool)
                row_support[nz_rows] = True
            else:
                row_support = np.any(np.asarray(sub) != 0, axis=1)
        if subset is None:
            a_op = self.a_op
        else:
            n_b = _bucket_for(len(subset))
            if self._A_ext is not None and n_b < self.n:
                bucket = n_b
                cols = jnp.take(self._A_ext, self._padded_idx(subset, n_b),
                                axis=1)
                a_op = DenseAOp(cols)
            else:
                mask = np.zeros(self.n, dtype=self.dtype)
                mask[subset] = 1.0
                a_op = MaskedAOp(self.a_op, jnp.asarray(mask))

        for attempt in range(max_attempts):
            W0, H0 = self.inits.next()
            if row_support is not None and not row_support.all():
                W0 = np.where(row_support[:, None], W0, 0.0)
            if bucket is not None:
                H0b = np.zeros((2, bucket), dtype=H0.dtype)
                H0b[:, : len(subset)] = H0[:, subset]
                H0 = H0b
            res = nmf_solve(
                a_op, jnp.asarray(W0, self.dtype),
                jnp.asarray(H0, self.dtype), nmf_opts,
            )
            if self._record(bool(res.success), int(res.iterations)):
                W = np.asarray(res.W)
                H = np.asarray(res.H)
                if subset is None:
                    H_out = H
                elif bucket is not None:
                    H_out = H[:, : len(subset)]
                else:
                    H_out = H[:, subset]
                left = H_out[0, :] > H_out[1, :]
                priority = -1.0
                if left.any() and (~left).any() and w_parent is not None:
                    priority = compute_priority(np.asarray(w_parent), W)
                return _NodeSolve(W, H_out, left, priority, True)
            if self.opts.verbose:
                print("\nNode factorization failed, retrying with new "
                      "initializers...")
        return _NodeSolve(None, None, None, -1.0, False)


def _actual_split(runner: _Rank2Runner, subset, w_parent,
                  precomputed=None):
    """One split attempt on a column subset.

    Reference: ActualSplit (clust_hier_generic.hpp:383-517).
    Returns (priority, W (m,2) device, left (|subset|,) bool).
    `precomputed` carries a _NodeSolve from a batched pair solve.
    """
    m = runner.m
    if len(subset) <= 3:
        return -1.0, np.zeros((m, 2)), np.zeros(len(subset), dtype=bool)

    ns = precomputed if precomputed is not None else runner.solve(
        subset, w_parent
    )
    if not ns.ok:
        if runner.opts.on_node_failure == "leaf":
            # production mode: an unsplittable node (e.g. duplicate
            # columns -> structurally singular 2x2 systems on every
            # retry) becomes a permanent leaf, like an exhausted
            # TrialSplit, instead of aborting the whole run
            if runner.opts.verbose:
                print("\nNode factorization failed on every retry; "
                      "keeping the node as a leaf.")
            return -2.0, np.zeros((m, 2)), np.zeros(len(subset),
                                                    dtype=bool)
        raise RuntimeError(
            "HierNMF2: node factorization failed after three attempts."
        )
    return ns.priority, ns.W, ns.left


def _trial_split(runner: _Rank2Runner, subset, min_priority, w_parent,
                 opts: ClustOptions, first=None):
    """Split with outlier detection and retries.

    Reference: TrialSplit (clust_hier_generic.hpp:245-376).  May shrink
    `subset` by dropping outlier items; on exhausting trial_allowance the
    node becomes a permanent leaf (priority -2) with its original docs.
    Returns (priority, subset, W, left).
    """
    subset = np.asarray(subset, dtype=np.int64)
    subset_backup = subset.copy()
    subset_small = np.empty(0, dtype=np.int64)

    trial = 0
    priority_one = -2.0
    W = left = None
    while trial < opts.trial_allowance:
        priority_one, W, left = _actual_split(
            runner, subset, w_parent, precomputed=first
        )
        first = None  # only valid for the untouched initial subset
        if priority_one < 0:
            break

        counts = np.array([int(left.sum()), int((~left).sum())])
        smallest_size = int(counts.min())
        if smallest_size < opts.unbalanced * len(left):
            label_small = 0 if smallest_size == counts[0] else 1
            subset_small = subset[left if label_small == 0 else ~left]

            # score the small cluster on its own; its parent topic vector is
            # the corresponding column of this split's W
            pr_small, _, _ = _actual_split(
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
        left = np.zeros(len(subset), dtype=bool)
        priority_one = -2.0

    return priority_one, subset, W, left


def _speculate_next(tree, runner, W_buffer, L_buffer):
    """Keep the next runner.spec_depth predicted pops' pair solves in
    flight
    (see the speculation block in _Rank2Runner).  Predictions are the
    top-priority leaves whose priorities are already final — everything
    but the two children the current in-flight solve is about to score.
    Pending entries that still match the prediction prefix are kept (one
    dispatch per node); a mismatched suffix is rolled back."""
    if not SPECULATE:
        runner.cancel_spec_from(0)
        return
    cand = [
        (-tree.nodes[q].pop_priority, q)
        for q, leaf in enumerate(tree.is_leaf)
        if leaf and q != tree.index0 and q != tree.index1
        and tree.nodes[q].priority > 0
    ]
    # ties break toward the smaller node index, like the pop's scan
    # (min_max_leaf_priorities uses strict > while ascending)
    cand.sort()
    preds = [q for _, q in cand[:runner.spec_depth]]

    pending = runner.spec_nodes()
    keep = 0
    while (keep < len(pending) and keep < len(preds)
           and pending[keep] == preds[keep]):
        keep += 1
    runner.cancel_spec_from(keep)

    for node in preds[keep:]:
        docs = tree.nodes[node].docs
        left = L_buffer[node]
        if docs is None or left is None or W_buffer[node] is None:
            break
        docs = np.asarray(docs)
        left = np.asarray(left, dtype=bool)
        if left.shape[0] != docs.shape[0]:
            break
        if not runner.push_spec(node, docs[left], docs[~left],
                                W_buffer[node]):
            # an ineligible prediction runs serially when popped, which
            # rolls back everything after it — no point dispatching more
            break


def _save_hier_checkpoint(path, tree, W_buffer, L_buffer, rng, stats,
                          i_next, root_W=None, root_left=None,
                          rng_state=None, config=None, init_counter=1):
    """Atomic npz checkpoint of the full hierclust state (SURVEY §5.4:
    'checkpoint = (W, H, iteration, RNG key, tree state)' — new scope
    beyond the reference, which has no checkpointing).  Device buffers
    are fetched on demand here; the hot loop never does.  `config` is
    the (num_clusters, m, n) fingerprint a resume must match;
    `init_counter` preserves initdir file-consumption order."""
    import pickle

    from ..common.checkpoint import atomic_savez

    payload = dict(tree.to_arrays())
    payload["i_next"] = np.int64(i_next)
    payload["nmf_count"] = np.int64(stats.nmf_count)
    payload["max_count"] = np.int64(stats.max_count)
    payload["iter_count"] = np.int64(stats.iter_count)
    payload["init_counter"] = np.int64(init_counter)
    if config is not None:
        payload["config"] = np.asarray(config, dtype=np.int64)
    payload["rng_state"] = np.frombuffer(
        pickle.dumps(rng_state if rng_state is not None
                     else rng.get_state()),
        dtype=np.uint8,
    )
    for idx, (Wb, Lb) in enumerate(zip(W_buffer, L_buffer)):
        if Wb is not None:
            if isinstance(Wb, SlabPair):  # chain-resident factor block
                Wb = Wb.materialize()
            payload[f"Wbuf_{idx}"] = np.asarray(Wb)
            payload[f"Lbuf_{idx}"] = np.asarray(Lb, dtype=bool)
    if root_W is not None:
        if isinstance(root_W, SlabPair):
            root_W = root_W.materialize()
        payload["root_W"] = np.asarray(root_W)
        payload["root_left"] = np.asarray(root_left, dtype=bool)
    atomic_savez(path, payload, suffix=".hckpt.tmp")


def _load_hier_checkpoint(path, node_count, config=None):
    import pickle

    with np.load(path, allow_pickle=False) as z:
        arrs = {k: z[k] for k in z.files}
    tree = Tree.from_arrays(arrs)
    if config is not None and "config" in arrs:
        saved = tuple(int(v) for v in arrs["config"])
        if saved != tuple(int(v) for v in config):
            raise ValueError(
                f"hierclust checkpoint at {path} was written for "
                f"(num_clusters, m, n)={saved}, but this run is "
                f"{tuple(int(v) for v in config)}"
            )
    elif len(tree.nodes) != node_count:
        # legacy checkpoint without a config record: the tree size at
        # least must match, or buffer indexing corrupts silently
        raise ValueError(
            f"hierclust checkpoint at {path} has {len(tree.nodes)} tree "
            f"nodes, but this run needs {node_count}"
        )
    W_buffer = [None] * node_count
    L_buffer = [None] * node_count
    for idx in range(node_count):
        if f"Wbuf_{idx}" in arrs:
            W_buffer[idx] = arrs[f"Wbuf_{idx}"]
            if f"Lbuf_{idx}" in arrs:
                L_buffer[idx] = arrs[f"Lbuf_{idx}"]
            else:
                # pre-labels checkpoint format stored the full H slab;
                # the split mask is H(0,:) > H(1,:) (tree.hpp:256)
                Hb = arrs[f"Hbuf_{idx}"]
                L_buffer[idx] = Hb[0, :] > Hb[1, :]
    rng_state = pickle.loads(bytes(arrs["rng_state"]))
    root_left = arrs.get("root_left")
    if root_left is None and "root_H" in arrs:
        root_left = arrs["root_H"][0, :] > arrs["root_H"][1, :]
    root = (arrs.get("root_W"), root_left)
    return (tree, W_buffer, L_buffer, rng_state, int(arrs["i_next"]),
            int(arrs["nmf_count"]), int(arrs["max_count"]),
            int(arrs.get("iter_count", 0)), root,
            int(arrs.get("init_counter", 1)))


def clust_hier(A, opts: ClustOptions, rng: Random,
               stats: ClustStats | None = None,
               checkpoint_path: str | None = None,
               mesh=None,
               host_A=None,
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
    import scipy.sparse as sp

    if host_A is None:
        # kept for the initdir row-support semantics AND the sparse
        # chunk-gather fast path (see _Rank2Runner.__init__); callers
        # passing a prebuilt sparse AOp supply host_A= explicitly to
        # get the chunk path
        if sp.issparse(A):
            host_A = A.tocsc()
        elif opts.initdir and isinstance(A, np.ndarray):
            host_A = A
    runner = _Rank2Runner(a_op, opts, inits, stats, dtype, mesh=mesh,
                          host_A=host_A)

    W = left = None
    start_i = 0
    ckpt_config = (num_clusters, m, n)
    if checkpoint_path and os.path.exists(checkpoint_path):
        (tree, W_buffer, L_buffer, rng_state, start_i,
         stats.nmf_count, stats.max_count, stats.iter_count,
         root, inits.counter) = _load_hier_checkpoint(
            checkpoint_path, node_count, config=ckpt_config)
        rng.set_state(rng_state)
        if start_i == 0:
            W, left = root
    else:
        tree = Tree()
        tree.init(num_clusters, m, n)
        W_buffer = [None] * node_count
        L_buffer = [None] * node_count

    split_index = 0

    # multi-split device chain (engines/hier_chain.py): on the common
    # fast path, the root factorization and segments of splits run as
    # ONE device program — one dispatch + one fetch per CHAIN_SEG
    # splits instead of per split.  Any deviation (trial-split
    # outliers, tiny/huge subsets, solver failure) bails to this
    # sequential loop for one split, then the chain resumes.
    from . import hier_chain

    chain = None
    if hier_chain.ChainDriver.available(runner, opts, mesh,
                                        checkpoint_path,
                                        _interrupt_after):
        chain = hier_chain.ChainDriver(runner, node_count)
        if W is not None and start_i == 0:
            # resuming a checkpoint whose root was already factored
            # (e.g. written by the sequential engine): hand the root to
            # the chain so it does not redraw the root seed
            chain._root_W = W
            chain._root_left = np.asarray(left, bool)

    if W is None and start_i == 0 and chain is None:
        # factor the root eagerly (<= 3 attempts); under the chain the
        # root rides in the first segment program instead
        ns = runner.solve(None)
        if not ns.ok:
            raise RuntimeError(
                "HierNMF2: root node factorization failed after three "
                "attempts"
            )
        W, left = ns.W, ns.left
        if checkpoint_path and not os.path.exists(checkpoint_path):
            _save_hier_checkpoint(
                checkpoint_path, tree, W_buffer, L_buffer, rng, stats, 0,
                root_W=W, root_left=left, config=ckpt_config,
                init_counter=inits.counter,
            )

    try:
        i = start_i
        force_sequential = False
        while i < num_clusters - 1:
            if chain is not None and not force_sequential:
                runner._cancel_spec()
                i0_seg = i
                i, outcome = chain.run_segment(
                    i, num_clusters, tree, W_buffer, L_buffer, stats,
                    opts,
                )
                if checkpoint_path and i > i0_seg:
                    # preemption safety at SEGMENT granularity (the
                    # chain's natural unit; per-split cadence would
                    # re-introduce one fetch per split).  Slab-resident
                    # factor blocks are materialized by the saver.
                    _save_hier_checkpoint(
                        checkpoint_path, tree, W_buffer, L_buffer, rng,
                        stats, i, root_W=chain._root_W,
                        root_left=chain._root_left, config=ckpt_config,
                        init_counter=inits.counter,
                    )
                if outcome == "done":
                    if opts.verbose:
                        print("\nHierNMF2: no further factorization "
                              "possible.\n")
                    break
                if outcome == "bail":
                    force_sequential = True
                continue
            force_sequential = False

            if i == 0:
                if W is None:
                    # a chain bail landed split 0 here: consume the
                    # chain-committed root, or (root attempt 1 failed on
                    # device) run the host retry ladder
                    if chain is not None and chain._root_W is not None:
                        W, left = chain._root_W, chain._root_left
                    else:
                        ns = runner.solve(None)
                        if not ns.ok:
                            raise RuntimeError(
                                "HierNMF2: root node factorization "
                                "failed after three attempts"
                            )
                        W, left = ns.W, ns.left
                        if chain is not None:
                            chain._root_W = W
                            chain._root_left = np.asarray(left, bool)
                min_priority = np.inf
                tree.split_root(W, labels=left)
            else:
                min_priority, max_priority, split_index = (
                    tree.min_max_leaf_priorities()
                )
                if max_priority < 0:
                    if opts.verbose:
                        print("\nHierNMF2: no further factorization possible.\n")
                    break
                W = W_buffer[split_index]
                if isinstance(W, SlabPair):
                    W = W.materialize()
                left = L_buffer[split_index]
                tree.split(split_index, W, labels=left)

            # factor both children; eligible pairs run as one batched solve.
            # W is the split node's (m, 2) buffer: column i IS child i's
            # parent topic vector, so the buffer rides to the device as one
            # resident array (no host-side column slicing).  A hit on the
            # speculative dispatch from an earlier split means this pair is
            # already executing (or done, with its result fetch already in
            # flight on the prefetch thread).
            token = None
            hit = runner.take_spec(split_index)
            if hit is not None:
                inflight, token = hit
            else:
                inflight = runner.dispatch_pair(
                    tree.left_child_docs(), tree.right_child_docs(), W,
                )
            if inflight is not None:
                # under the chain, the next splits run as a device
                # segment — speculative dispatch would only duplicate
                # work the chain re-executes
                if chain is None:
                    _speculate_next(tree, runner, W_buffer, L_buffer)
                pair = runner.finish_pair(inflight, token)
            else:
                pair = None
            for slot, (idx, docs_fn, tv_fn) in enumerate((
                (tree.index0, tree.left_child_docs, tree.left_child_topic_vector),
                (tree.index1, tree.right_child_docs,
                 tree.right_child_topic_vector),
            )):
                priority, subset, W_c, left_c = _trial_split(
                    runner, docs_fn(), min_priority, tv_fn(), opts,
                    first=None if pair is None else pair[slot],
                )
                tree.nodes[idx].docs = subset  # TrialSplit may drop outliers
                # pop order: raw NDCG (reference) or size-scaled NDCG
                # (graph workloads — a leaf holding half the corpus must
                # not be starved by sliver splits with higher NDCG)
                pop = priority
                if opts.priority_method == "size_ndcg" and priority > 0:
                    pop = priority * len(subset)
                tree.set_node_priority(idx, priority, pop)
                W_buffer[idx] = W_c
                L_buffer[idx] = left_c

            if opts.verbose:
                print(f"[{i + 1}] ", end="", flush=True)

            if checkpoint_path:
                # record the PRE-speculation RNG state: a resumed run replays
                # the next split from scratch and must redraw the same seeds
                _save_hier_checkpoint(
                    checkpoint_path, tree, W_buffer, L_buffer, rng, stats,
                    i + 1, rng_state=runner.spec_rng_state(),
                    config=ckpt_config, init_counter=inits.counter,
                )
            if _interrupt_after is not None and (i + 1) >= _interrupt_after:
                raise KeyboardInterrupt(
                    f"test interrupt after {i + 1} splits"
                )
            if chain is not None:
                chain.mark_dirty()
            i += 1

    finally:
        # roll back any unconsumed speculation (downstream rng
        # consumers like flat refinement must see the sequential
        # stream position) and stop the prefetch thread — on the
        # normal exit, an early break, and test interrupts alike
        runner.close()

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
