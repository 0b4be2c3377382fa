"""Multi-split device chain for HierNMF2.

Reference: the sequential tree loop in clust_hier_generic.hpp:77-238
(pop max-priority leaf -> split -> factor both children, repeat).  The
reference pays nothing for the host round trip per split; on TPU
hardware reached through a high-latency link every per-split host sync
costs a ~26 ms round trip (scripts/tpu_batch17.py), which floors the
whole wall clock: speculation + prefetch (engines/hierclust.py) got a
12-cluster reuters-shape run to 0.407 s, of which ~0.27 s is still
per-split round-trip overhead.

This module fuses S consecutive splits into ONE device program: a
lax.scan whose step pops the max-priority leaf, partitions its docs,
gathers both children's column subsets, runs the pair rank-2 solve, and
commits labels/priorities — so the host pays one dispatch + one fetch
per S splits instead of per split.  Split 0 is included: the root
factorization rides in as a virtual node at slab index node_count with
pop priority +inf, so a clean run is root-solve + ceil((k-1)/S)
segment programs and nothing else.

Bit-parity with the sequential engine is by construction:
  - the per-child solve body IS the sequential fused pair program's:
    both trace hierclust._solve_from_draw (draw + solve loop +
    priority/gate computation), at the same power-of-2 bucket width
    max(512, next_pow2(max(|left|, |right|)));
  - initializer seeds come from the same host MT19937 stream, pre-drawn
    per segment and rolled back to exactly the consumed count;
  - the device pop (argmax over leaf pop-priorities, first-max
    tie-break) matches Tree.min_max_leaf_priorities, and the host
    replays every committed split through the ordinary Tree methods,
    asserting the pop sequence matches.

Anything off the common path BAILS to the sequential engine for one
split, then the chain resumes: TrialSplit's unbalanced gate
(clust_hier_generic.hpp:296-373), children with <= 3 docs, solver
failure (singular system -> retry ladder), subsets too wide for the
bucket eligibility rule, and pop-order mismatches.  The device
unbalanced check is deliberately conservative (f32 margin): any
borderline split bails so the host's f64 gate decides, which can cost a
redundant redo but can never commit a split the reference would have
trial-dropped.

The chain is used only on the common fast path: dense A, random or
spectral init, no initdir, no mesh.  Checkpointing runs at SEGMENT
granularity under the chain (clust_hier saves after every committed
segment) — coarser than the sequential engine's per-split cadence but
preemption-safe at full chain speed.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.aop import DenseAOp
from .tree import SlabHolder, SlabPair

# Module knobs (benchmarking / tests)
CHAIN = True          # master switch for the multi-split chain
CHAIN_SEG = 32        # splits per device program call
CHAIN_MAX_WIDTH = 1 << 16  # widest bucket compiled into the chain; a
#                            popped subset needing more bails to the
#                            sequential engine (compile-size bound)

_MIN_BUCKET = 512     # keep in sync with hierclust._MIN_BUCKET

# Telemetry of the most recent clust_hier run (tests assert the chain
# actually engaged; bench scripts report segment/bail counts).
LAST_STATS = {"segments": 0, "committed": 0, "bails": 0, "resyncs": 0}


def _dbg(msg: str) -> None:
    """SMALLK_TPU_DEBUG_DISPATCH=1: per-dispatch timing lines on stderr
    (for isolating environment watchdog kills — each line flushes
    BEFORE the dispatch blocks, so a crash log shows the killer)."""
    import os
    import sys

    if os.environ.get("SMALLK_TPU_DEBUG_DISPATCH"):
        print(msg, file=sys.stderr, flush=True)


# Bucket sizes (m x width ELEMENTS) at/above this solve the two
# children SEQUENTIALLY inside the branch instead of vmapped.  Once a
# single solve is stream-bound, per-solve cost is batch-invariant
# (tpu_batch41) and sequential siblings pay i0 + i1 iterations instead
# of the vmapped 2 x max: -26% on 20news-shape, m=39727 (tpu_batch43:
# 1.37 -> 1.09 s, wins down to w=512 = 2e7 elements).  Below the
# stream-bound size a single thin solve underutilizes the chip and
# sequential siblings LOSE (100-leaf text, m=12411, buckets <= 2048 =
# <= 2.5e7 elements: 1.74 -> 1.98 s).  The boundary is therefore on
# m x w, calibrated between those two measurements.
SEQ_PAIR_MIN_ELEMS = 3.0e7


def _widths(n: int):
    """Bucket widths compiled into the chain program: the shared ladder
    (hierclust._bucket_widths — pow2 to 4096, then 2048 steps),
    strictly below n and capped at CHAIN_MAX_WIDTH."""
    from .hierclust import _bucket_widths

    return _bucket_widths(n, cap=CHAIN_MAX_WIDTH)


def _chain_widths(runner):
    """Compiled bucket ladder for this operand: doc widths for the
    dense gather path, CHUNK-count widths for the sparse chunk path
    (one width covers chunks and docs — chunks >= nonempty docs).  The
    sparse ladder stops at HALF the corpus's chunks: wider subsets are
    cheaper as masked full-width solves (the chain's extra masked
    branch) than as chunk gathers, whose per-entry constants are ~2x
    the tuned full-width buckets' (measured, scripts/tpu_batch64).

    Under a dispatch budget, widths whose WORST-CASE single step
    (2 children x ~150 iterations) would outrun the environment
    watchdog are dropped — those splits bail to the host's segmented
    masked path instead of dying mid-dispatch."""
    if runner._A_ext is not None:
        ws = _widths(runner.n)
        if runner._budget is not None:
            item = jnp.dtype(runner._A_ext.dtype).itemsize
            iters = min(runner.opts.nmf_opts.max_iter, 150)
            ws = tuple(
                w for w in ws
                if 2 * iters * (float(runner.m) * w * item / 2e11)
                <= 0.5 * runner._budget
            )
        return ws
    if getattr(runner, "_A_chunks", None) is not None:
        ch = runner._A_chunks
        ws = _widths(max(2, ch.C // 2))
        if runner._budget is not None:
            iters = min(runner.opts.nmf_opts.max_iter, 150)
            # chunk-product rate: measured ~163 ms/iteration at ~8.4M
            # padded entries (tpu_batch64) ~= 5e7 entries/s per product
            # pair; budgeted at 4e7 for safety margin — watchdog kills
            # are fatal, so the model must err narrow
            ws = tuple(
                w for w in ws
                if 2 * iters * (w * ch.L0 / 4e7) <= 0.5 * runner._budget
            )
        return ws
    return ()


def _pack_bits_dev(left_full):
    """(n,) bool -> (ceil(n/32),) uint32, LSB-first — the same layout as
    hierclust._pack_node_result / _unpack_left."""
    n = left_full.shape[0]
    pad = (-n) % 32
    lp = jnp.pad(left_full, (0, pad)) if pad else left_full
    return jnp.sum(
        lp.reshape(-1, 32).astype(jnp.uint32)
        << jnp.arange(32, dtype=jnp.uint32)[None, :],
        axis=1, dtype=jnp.uint32,
    )


def _unpack_bits_host(words: np.ndarray, count: int) -> np.ndarray:
    bits = np.unpackbits(
        np.ascontiguousarray(words, dtype=np.uint32).view(np.uint8),
        bitorder="little",
    )
    return bits[:count].astype(bool)


def _pack_bits_host(full: np.ndarray) -> np.ndarray:
    pad = (-len(full)) % 32
    if pad:
        full = np.concatenate([full, np.zeros(pad, dtype=bool)])
    return np.packbits(full, bitorder="little").view(np.uint32)


def _child_solve(A_ext, idx, seed, wp, n_full, opts, fdtype,
                 restarts=1, init="random"):
    """One child factorization at bucket width idx.shape[0].

    Traces hierclust._solve_from_draw — the SAME solve body the
    sequential fused pair program compiles (same threefry draw, same
    solve loop, same best-of-R objective and priority gates; VERDICT r3
    #3) — then scatters the split labels back to full doc width for the
    chain's partition bookkeeping."""
    from .hierclust import _solve_from_draw

    m = A_ext.shape[0]
    cols = jnp.take(A_ext, idx, axis=1)
    op = DenseAOp(cols)
    valid = idx < n_full

    def draw(key):
        kW, kH = jax.random.split(key)
        W0 = jax.random.uniform(kW, (m, 2), fdtype)
        Hf = jax.random.uniform(kH, (2, n_full), fdtype)
        H0 = jnp.take(Hf, idx, axis=1, mode="fill", fill_value=0)
        return W0, H0

    Wb, _Hb, succ, iters, pr, left = _solve_from_draw(
        op, valid, draw, jax.random.PRNGKey(seed), wp, opts, init,
        restarts,
    )
    left_full = jnp.zeros((n_full,), jnp.bool_).at[idx].set(
        jnp.where(valid, left, False), mode="drop"
    )
    nl = jnp.sum(left & valid).astype(jnp.int32)
    nr = jnp.sum((~left) & valid).astype(jnp.int32)
    return (Wb, succ, iters.astype(jnp.int32),
            pr.astype(jnp.float32), left_full, nl, nr)


def _child_solve_sparse(chunks, mask, seed, wp, opts, fdtype, w,
                        restarts=1, init="random"):
    """One child factorization on a chunk-gathered sparse subset
    (ops/ell_cols.CscChunks) at bucket width w — w covers both the
    subset's chunk count and its doc count (chunks >= nonempty docs).
    Traces the SAME hierclust._solve_from_draw body as the dense
    branch; per-iteration product cost is O(w * L0) ~ O(nnz_subset),
    the reference's compact-submatrix scaling
    (clust_hier_generic.hpp:424 / sparse_matrix_impl.hpp:479)."""
    from .hierclust import _solve_from_draw

    m, n_full = chunks.shape
    idx_docs, idx_chunks, slot = chunks.gather_device(mask, w)
    op = chunks.gathered(idx_chunks, slot, w)
    valid = idx_docs < n_full

    def draw(key):
        kW, kH = jax.random.split(key)
        W0 = jax.random.uniform(kW, (m, 2), fdtype)
        Hf = jax.random.uniform(kH, (2, n_full), fdtype)
        H0 = jnp.take(Hf, idx_docs, axis=1, mode="fill", fill_value=0)
        return W0, H0

    Wb, _Hb, succ, iters, pr, left = _solve_from_draw(
        op, valid, draw, jax.random.PRNGKey(seed), wp, opts, init,
        restarts,
    )
    left_full = jnp.zeros((n_full,), jnp.bool_).at[idx_docs].set(
        jnp.where(valid, left, False), mode="drop"
    )
    nl = jnp.sum(left & valid).astype(jnp.int32)
    nr = jnp.sum((~left) & valid).astype(jnp.int32)
    return (Wb, succ, iters.astype(jnp.int32),
            pr.astype(jnp.float32), left_full, nl, nr)


def _child_solve_masked(full_op, mask, seed, wp, opts, fdtype,
                        restarts=1, init="random"):
    """One child factorization as a MASKED full-width solve inside the
    chain (sparse mode, wide subsets): above roughly half the corpus the
    bucketed-ELL full products beat chunk-gathered subset products on
    constants (measured at 250k docs — the gathered formulation runs
    ~2x slower per entry than the tuned full-width buckets), so wide
    nodes ride the fast full products and narrow nodes the
    subset-proportional gathers.  Traces the same _solve_from_draw body
    as the sequential _fused_masked_solve."""
    from ..ops.aop import MaskedAOp
    from .hierclust import _solve_from_draw

    m, n_full = full_op.shape
    op = MaskedAOp(full_op, mask.astype(full_op.dtype))

    def draw(key):
        kW, kH = jax.random.split(key)
        return (jax.random.uniform(kW, (m, 2), fdtype),
                jax.random.uniform(kH, (2, n_full), fdtype))

    Wb, _Hb, succ, iters, pr, left = _solve_from_draw(
        op, mask, draw, jax.random.PRNGKey(seed), wp, opts, init,
        restarts,
    )
    left_full = left & mask
    nl = jnp.sum(left_full).astype(jnp.int32)
    nr = jnp.sum((~left) & mask).astype(jnp.int32)
    return (Wb, succ, iters.astype(jnp.int32),
            pr.astype(jnp.float32), left_full, nl, nr)


def _root_solve(operand, seed, opts, fdtype, restarts, init="random"):
    """Root factorization at FULL width inside the chain program.

    Replicates the serial path (hierclust._Rank2Runner.solve(None) ->
    _fused_masked_solve idx=None) exactly by tracing the same
    hierclust._solve_from_draw body: one host seed, W0 (m, 2) and
    H0 (2, n) drawn directly (no gather).  `operand` is the dense
    A_ext array or, in sparse mode, the (full_op, chunks) pair — the
    root then runs on the full-width sparse operand's bucketed
    products, not a gather.
    Returns (W, success, iters, left_full)."""
    from .hierclust import _solve_from_draw

    if isinstance(operand, tuple):
        op, chunks = operand
        m, n = chunks.shape
    else:
        m = operand.shape[0]
        n = operand.shape[1] - 1
        op = DenseAOp(operand[:, :n])
    valid = jnp.ones((n,), jnp.bool_)

    def draw(key):
        kW, kH = jax.random.split(key)
        return (jax.random.uniform(kW, (m, 2), fdtype),
                jax.random.uniform(kH, (2, n), fdtype))

    Wb, _Hb, succ, iters, _pr, left = _solve_from_draw(
        op, valid, draw, jax.random.PRNGKey(seed),
        jnp.zeros((m,), fdtype), opts, init, restarts,
    )
    return Wb, succ, iters.astype(jnp.int32), left


@functools.partial(
    jax.jit,
    static_argnames=("opts", "fdtype", "unbalanced", "widths", "seg",
                     "restarts", "size_pop", "do_root", "max_terms",
                     "init", "masked_ok"),
)
def _chain_program(A_ext, seeds, root_seed, i0, n_steps, last_split,
                   assign, labels_w, W_slab, pri, pop, leaf,
                   opts, fdtype, unbalanced, widths, seg,
                   restarts=1, size_pop=False, do_root=False,
                   max_terms=0, init="random", masked_ok=True):
    """Run up to `n_steps` (<= seg) splits on device.

    Step s handles split i = i0 + s: pop the max-pop-priority leaf
    (done if the max is negative), partition its docs by its stored
    labels into children 2i / 2i+1, pair-solve both children, commit
    labels + priorities + W into the carry — or set the bail flag and
    freeze (the host redoes that split sequentially).

    `A_ext` is the dense A-with-zero-column array, or — sparse mode —
    the (full_op, chunks) pair: the root solves on the full-width
    bucketed-ELL operand and every step's children on chunk-gathered
    subsets, with `widths` read as CHUNK-count buckets (chunk count
    >= nonempty doc count, so one width covers both).

    Returns (carry', ys) where ys stacks one packed f32 row per step:
    [stat, popped, succ0, succ1, iters0, iters1, pr0, pr1,
     bitcast(left bits c0), bitcast(left bits c1)]
    with stat 0=inactive, 1=committed, 2=bailed, 3=done(no positive
    leaf priority).
    """
    sparse_mode = isinstance(A_ext, tuple)
    if sparse_mode:
        _full_op, _chunks = A_ext
        m, n = _chunks.shape
    else:
        m = A_ext.shape[0]
        n = A_ext.shape[1] - 1
    nw = (n + 31) // 32
    nbr = len(widths)
    d = jnp.arange(n, dtype=jnp.int32)
    word_idx = d >> 5
    bit_shift = (d & 31).astype(jnp.uint32)
    widths_arr = jnp.asarray(widths, dtype=jnp.int32)
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    def noop(_):
        return (jnp.zeros((2, m, 2), fdtype),
                jnp.zeros((2,), jnp.bool_),
                jnp.zeros((2,), jnp.int32),
                jnp.zeros((2,), jnp.float32),
                jnp.zeros((2, n), jnp.bool_),
                jnp.zeros((2,), jnp.int32),
                jnp.zeros((2,), jnp.int32))

    def step(carry, xs):
        (assign, labels_w, W_slab, pri, pop, leaf,
         committed, bailed, done) = carry
        s, seed2 = xs
        i = i0 + s
        c0 = 2 * i
        c1 = c0 + 1
        active = (s < n_steps) & ~bailed & ~done & (i <= last_split)

        # --- pop (Tree.min_max_leaf_priorities: argmax pop_priority,
        # first-max tie-break; all-negative max -> no further splits)
        ppl = jnp.where(leaf, pop, neg_inf)
        maxpp = jnp.max(ppl)
        done_now = active & (maxpp < 0)
        act = active & ~done_now
        p = jnp.argmax(ppl).astype(jnp.int32)

        # --- partition popped docs by the popped node's stored labels
        pbits = (labels_w[p, word_idx] >> bit_shift) & jnp.uint32(1)
        go_left = pbits.astype(jnp.bool_)
        assign2 = jnp.where(
            assign == p, jnp.where(go_left, c0, c1), assign
        )
        mask0 = assign2 == c0
        mask1 = assign2 == c1
        s0 = jnp.sum(mask0).astype(jnp.int32)
        s1 = jnp.sum(mask1).astype(jnp.int32)
        mx = jnp.maximum(s0, s1)
        if sparse_mode:
            # sparse buckets are sized by CHUNK count (>= nonempty doc
            # count); the widest child picks the compiled branch
            cdoc = _chunks.chunk_doc
            m0x = jnp.concatenate(
                [mask0, jnp.zeros((1,), jnp.bool_)])[cdoc]
            m1x = jnp.concatenate(
                [mask1, jnp.zeros((1,), jnp.bool_)])[cdoc]
            s0c = jnp.sum(m0x).astype(jnp.int32)
            s1c = jnp.sum(m1x).astype(jnp.int32)
            mx = jnp.maximum(mx, jnp.maximum(s0c, s1c))

        # --- bucket eligibility (hierclust._pair_eligible semantics).
        # Sparse mode carries one extra branch: subsets too wide for
        # the chunk ladder run as MASKED full-width solves in-chain
        # (see _child_solve_masked) instead of bailing — except under a
        # dispatch budget (masked_ok=False), where a single in-chain
        # full-width solve could outrun the environment watchdog: wide
        # steps then bail to the host's segmented masked path.
        widx = jnp.searchsorted(widths_arr, mx).astype(jnp.int32)
        big_enough = (s0 > 3) & (s1 > 3)
        use_masked = bool(sparse_mode) and masked_ok
        eligible = big_enough & ((widx < nbr) | use_masked)
        run = act & eligible

        wp = W_slab[p]  # (m, 2): column slot = that child's parent vec

        def make_branch(w):
            def br(_):
                if sparse_mode:
                    solve = lambda mk, sd, wpc: _child_solve_sparse(  # noqa: E731,E501
                        _chunks, mk, sd, wpc, opts, fdtype, w,
                        restarts, init,
                    )
                    if w * _chunks.L0 >= SEQ_PAIR_MIN_ELEMS:
                        outs = [solve(mk, seed2[i], wp.T[i])
                                for i, mk in enumerate((mask0, mask1))]
                        return jax.tree.map(
                            lambda *xs: jnp.stack(xs), *outs
                        )
                    return jax.vmap(solve)(
                        jnp.stack([mask0, mask1]), seed2, wp.T
                    )
                idx2 = jnp.stack([
                    jnp.nonzero(mask0, size=w, fill_value=n)[0]
                    .astype(jnp.int32),
                    jnp.nonzero(mask1, size=w, fill_value=n)[0]
                    .astype(jnp.int32),
                ])
                solve = lambda idx, sd, wpc: _child_solve(  # noqa: E731
                    A_ext, idx, sd, wpc, n, opts, fdtype, restarts,
                    init,
                )
                if m * w >= SEQ_PAIR_MIN_ELEMS:
                    # wide buckets are bandwidth-bound: run the two
                    # children one after another (pays i0 + i1
                    # iterations, not 2 x max)
                    outs = [solve(idx2[i], seed2[i], wp.T[i])
                            for i in range(2)]
                    return jax.tree.map(
                        lambda *xs: jnp.stack(xs), *outs
                    )
                return jax.vmap(solve)(idx2, seed2, wp.T)
            return br

        if use_masked:
            def masked_branch(_):
                solve = lambda mk, sd, wpc: _child_solve_masked(  # noqa: E731,E501
                    _full_op, mk, sd, wpc, opts, fdtype, restarts, init,
                )
                # full-width products are stream-bound: sequential
                # siblings (i0 + i1 iterations, not 2 x max)
                outs = [solve(mk, seed2[i], wp.T[i])
                        for i, mk in enumerate((mask0, mask1))]
                return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

            branch = jnp.where(
                run, jnp.minimum(widx, nbr), nbr + 1
            )
            Wc, succ, iters, prc, left_full, nl, nr = jax.lax.switch(
                branch,
                [make_branch(w) for w in widths] + [masked_branch, noop],
                None,
            )
        else:
            branch = jnp.where(run, jnp.minimum(widx, nbr - 1), nbr)
            Wc, succ, iters, prc, left_full, nl, nr = jax.lax.switch(
                branch, [make_branch(w) for w in widths] + [noop], None
            )

        # --- gates: solver failure or the (conservative, f32) unbalanced
        # outlier check -> bail; the host's f64 TrialSplit decides.
        cnt = jnp.stack([s0, s1]).astype(jnp.float32)
        smallest = jnp.minimum(nl, nr).astype(jnp.float32)
        thresh = jnp.float32(unbalanced) * cnt
        unbal = (prc >= 0) & (smallest < thresh * 1.000001 + 1e-3)
        ok = jnp.all(succ) & ~jnp.any(unbal)
        commit = run & ok
        bail_now = act & (~eligible | ~ok)

        # --- commit
        def sel(new, old):
            return jnp.where(commit, new, old)

        assign = sel(assign2, assign)
        leaf = leaf.at[p].set(sel(False, leaf[p]))
        leaf = leaf.at[c0].set(sel(True, leaf[c0]))
        leaf = leaf.at[c1].set(sel(True, leaf[c1]))
        W_slab = W_slab.at[c0].set(sel(Wc[0], W_slab[c0]))
        W_slab = W_slab.at[c1].set(sel(Wc[1], W_slab[c1]))
        bits0 = _pack_bits_dev(left_full[0])
        bits1 = _pack_bits_dev(left_full[1])
        labels_w = labels_w.at[c0].set(sel(bits0, labels_w[c0]))
        labels_w = labels_w.at[c1].set(sel(bits1, labels_w[c1]))
        pri = pri.at[c0].set(sel(prc[0], pri[c0]))
        pri = pri.at[c1].set(sel(prc[1], pri[c1]))
        # pop policy: raw NDCG, or size-scaled NDCG for graph workloads
        # (hierclust commit: pop = priority * len(subset) when
        # priority > 0).  The f32 product can order differently from
        # the host's f64 product only on exact near-ties; the replay's
        # pop check turns such a flip into a bail, never a wrong tree.
        if size_pop:
            popc = jnp.where(prc > 0, prc * cnt, prc)
        else:
            popc = prc
        pop = pop.at[c0].set(sel(popc[0], pop[c0]))
        pop = pop.at[c1].set(sel(popc[1], pop[c1]))

        committed = committed + commit.astype(jnp.int32)
        bailed = bailed | bail_now
        done = done | done_now

        stat = jnp.where(
            commit, 1, jnp.where(bail_now, 2, jnp.where(done_now, 3, 0))
        ).astype(jnp.float32)
        head = jnp.stack([
            stat, p.astype(jnp.float32),
            succ[0].astype(jnp.float32), succ[1].astype(jnp.float32),
            iters[0].astype(jnp.float32), iters[1].astype(jnp.float32),
            prc[0], prc[1],
        ])
        ys = jnp.concatenate([
            head,
            jax.lax.bitcast_convert_type(bits0, jnp.float32),
            jax.lax.bitcast_convert_type(bits1, jnp.float32),
        ])
        return ((assign, labels_w, W_slab, pri, pop, leaf,
                 committed, bailed, done), ys)

    row_w = 8 + 2 * nw
    bailed0 = jnp.zeros((), jnp.bool_)
    if do_root:
        # the root factorization rides IN this program: its W goes to
        # the virtual-root slab row, its split labels to labels_w[-1]
        # (step 0 partitions from them), and [succ, iters, bits] is
        # prepended to ys so the host replay commits it without a
        # separate dispatch+fetch (~90 ms of the 12c wall, batch27)
        rW, rsucc, riters, rleft = _root_solve(
            A_ext, root_seed, opts, fdtype, restarts, init
        )
        W_slab = W_slab.at[-1].set(rW)
        labels_w = labels_w.at[-1].set(_pack_bits_dev(rleft))
        root_row = jnp.zeros((row_w,), jnp.float32)
        root_row = root_row.at[0].set(rsucc.astype(jnp.float32))
        root_row = root_row.at[1].set(riters.astype(jnp.float32))
        root_row = jax.lax.dynamic_update_slice(
            root_row,
            jax.lax.bitcast_convert_type(
                _pack_bits_dev(rleft), jnp.float32),
            (8,),
        )
        bailed0 = ~rsucc
    else:
        root_row = jnp.zeros((row_w,), jnp.float32)

    carry0 = (assign, labels_w, W_slab, pri, pop, leaf,
              jnp.zeros((), jnp.int32), bailed0,
              jnp.zeros((), jnp.bool_))
    xs = (jnp.arange(seg, dtype=jnp.int32), seeds)
    carry, ys = jax.lax.scan(step, carry0, xs)
    out = jnp.concatenate([root_row, ys.ravel()])
    if max_terms > 0:
        # rank every slab column's top terms in THIS fetch — the final
        # tree.compute_top_terms then needs no device round trip for
        # chain-committed nodes.  Must match tree._rank_topic_columns
        # exactly (stable argsort of the negation) for bit parity.
        flat = jnp.swapaxes(carry[2], 1, 2).reshape(-1, m)
        tt = jnp.argsort(-flat, axis=1, stable=True)[:, :max_terms]
        out = jnp.concatenate([
            out,
            jax.lax.bitcast_convert_type(
                tt.astype(jnp.int32), jnp.float32).ravel(),
        ])
    return carry, out


@jax.jit
def _slab_scatter(W_slab, idx, vals):
    return W_slab.at[idx].set(vals)


class ChainDriver:
    """Host side of the multi-split chain: owns the device carry,
    replays committed splits through the ordinary Tree bookkeeping, and
    resynchronizes device state after sequential (bail) splits."""

    def __init__(self, runner, node_count: int):
        from .nmf import _dispatch_budget

        self.runner = runner
        self.nc = node_count
        self.n = runner.n
        self.m = runner.m
        self.nw = (self.n + 31) // 32
        self.fdtype = runner.dtype
        self.widths = _chain_widths(runner)
        # Dispatch-time budget (engines/nmf._dispatch_budget): in
        # watchdog-limited environments (the axon relay kills single
        # executions past ~30-60 s) a 32-split segment on a big operand
        # is one dispatch and CAN be killed mid-flight.  When a budget
        # is configured, segments start short, the per-split wall is
        # measured (compile inflation only makes the next segment
        # conservatively shorter), and the segment length adapts to
        # ~half the budget.  No budget (real deployments) = full
        # CHAIN_SEG segments.
        self._budget = _dispatch_budget()
        self._split_cost = None
        self.holder = SlabHolder()
        self._state = None       # (assign, labels_w, pri, pop, leaf) dev
        self._dirty = True       # host tree changed since last sync
        # the root rides as a VIRTUAL node at slab index nc: the root
        # factorization itself runs inside the first segment program
        # (attempt 1; failure bails the ladder to the host), and split 0
        # is an ordinary chain step that pops it (pop=+inf) and solves
        # children 0/1 — a clean run needs no separate root program.
        # After the chain commits it, _root_W is a SlabPair view and
        # _root_left the full-width boolean split mask; the sequential
        # fallback (clust_hier's i == 0 branch) consumes both directly.
        self._root_W = None
        self._root_left = None
        global LAST_STATS
        LAST_STATS = {"segments": 0, "committed": 0, "bails": 0,
                      "resyncs": 0}

    @staticmethod
    def available(runner, opts, mesh, checkpoint_path, interrupt_after):
        # sparse mode works even with an empty chunk ladder (its masked
        # full-width branch covers every subset) — unless a dispatch
        # budget disables in-chain masked solves AND there are no chunk
        # widths; the dense gather path needs at least one width
        sparse_ok = (
            getattr(runner, "_A_chunks", None) is not None
            and (len(_chain_widths(runner)) > 0
                 or not runner.should_segment_full())
        )
        ok_operand = (
            (runner._A_ext is not None
             and len(_chain_widths(runner)) > 0)
            or sparse_ok
        )
        return (
            CHAIN
            and ok_operand
            and runner.inits.initdir is None
            and opts.init_method in ("random", "spectral")
            and opts.priority_method in ("ndcg", "size_ndcg")
            and mesh is None
            and interrupt_after is None
        )

    # --- device-state (re)construction -----------------------------------

    def _sync_from_host(self, tree, W_buffer, L_buffer):
        """Rebuild the small device state from the host tree, uploading
        factor blocks only for leaves not already resident in the slab.
        State arrays are sized nc+1: index nc is the virtual root node
        (a leaf with pop=+inf before split 0, dead afterwards)."""
        nc, n, nw = self.nc, self.n, self.nw
        assign = np.full(n, -1, dtype=np.int32)
        labels = np.zeros((nc + 1, nw), dtype=np.uint32)
        pri = np.zeros(nc + 1, dtype=np.float32)
        pop = np.zeros(nc + 1, dtype=np.float32)
        leaf = np.zeros(nc + 1, dtype=bool)
        upload_idx, upload_val = [], []
        if tree.active_nodes == 0:
            # pre-split-0: everything lives in the virtual root.  The
            # root factors/labels are either absent (the first segment
            # program solves the root itself), already slab-resident
            # (SlabPair from a prior chain commit), or host arrays (a
            # bail forced the host retry ladder).
            assign[:] = nc
            leaf[nc] = True
            pop[nc] = pri[nc] = np.inf
            if self._root_left is not None:
                labels[nc] = _pack_bits_host(self._root_left)
            rw = self._root_W
            if rw is not None and not (
                isinstance(rw, SlabPair) and rw.holder is self.holder
            ):
                upload_idx.append(nc)
                upload_val.append(
                    rw.materialize() if isinstance(rw, SlabPair)
                    else jnp.asarray(np.asarray(rw), self.fdtype)
                )
        for q, is_leaf in enumerate(tree.is_leaf):
            node = tree.nodes[q]
            if not node.is_valid:
                continue
            pri[q] = np.float32(node.priority)
            pop[q] = np.float32(node.pop_priority)
            if not is_leaf:
                continue
            leaf[q] = True
            docs = node.docs
            assign[docs] = q
            lb = L_buffer[q]
            if lb is not None and len(lb) == len(docs):
                full = np.zeros(n, dtype=bool)
                full[docs[np.asarray(lb, dtype=bool)]] = True
                labels[q] = _pack_bits_host(full)
            wb = W_buffer[q]
            if wb is not None and not (
                isinstance(wb, SlabPair) and wb.holder is self.holder
            ):
                upload_idx.append(q)
                upload_val.append(
                    wb.materialize() if isinstance(wb, SlabPair)
                    else jnp.asarray(np.asarray(wb), self.fdtype)
                )

        if self.holder.current is None:
            self.holder.current = jnp.zeros(
                (nc + 1, self.m, 2), self.fdtype
            )
        if upload_idx:
            self.holder.current = _slab_scatter(
                self.holder.current,
                jnp.asarray(np.asarray(upload_idx, np.int32)),
                jnp.stack(upload_val),
            )
        self._state = (
            jnp.asarray(assign), jnp.asarray(labels),
            jnp.asarray(pri), jnp.asarray(pop), jnp.asarray(leaf),
        )
        self._dirty = False

    def mark_dirty(self):
        """The host tree advanced outside the chain (sequential split);
        rebuild device state before the next segment."""
        self._dirty = True

    # --- segment execution ------------------------------------------------

    def run_segment(self, i: int, num_clusters: int, tree, W_buffer,
                    L_buffer, stats, opts):
        """Run one chain segment starting at split ordinal `i` (>= 1).

        Replays committed splits into `tree` and the host buffers.
        Returns (i_next, outcome) with outcome one of "ok" (segment
        completed or partially replayed), "bail" (host must run split
        i_next sequentially), "done" (no further factorization
        possible).
        """
        runner = self.runner
        rng = runner.inits.rng
        if self._dirty:
            self._sync_from_host(tree, W_buffer, L_buffer)
            LAST_STATS["resyncs"] += 1
        LAST_STATS["segments"] += 1

        # the root factorization runs INSIDE the first segment program
        # unless a bail already forced it onto the host
        do_root = i == 0 and self._root_W is None
        if do_root and runner.should_segment_full():
            # the one-shot in-program root would risk the environment's
            # dispatch watchdog: bail split 0 to the host, whose solve()
            # runs the root in budget-sized segments, then resume the
            # chain with the host-provided root
            self._dirty = True
            LAST_STATS["bails"] += 1
            return i, "bail"

        seg_cap = CHAIN_SEG
        if self._budget is not None:
            if self._split_cost is None:
                # probe segment sized from the operand model: sparse
                # wide splits run MASKED full-width solves (full
                # products per iteration), dense splits gather at most
                # ~n/2-wide buckets (~200 GB/s, tpu_batch18) — so a
                # huge sparse operand probes 1 step while the measured
                # dense 12c/20news paths keep full segments
                if runner._A_ext is not None:
                    item = jnp.dtype(runner._A_ext.dtype).itemsize
                    est_iter = (float(runner.m) * float(runner.n) / 2
                                * item / 2e11)
                else:
                    est_iter = runner.est_full_iter_seconds()
                est_step = max(1e-6, 2 * 60 * est_iter)
                seg_cap = max(1, min(
                    CHAIN_SEG, int(0.5 * self._budget / est_step)))
            else:
                seg_cap = max(1, min(
                    CHAIN_SEG,
                    int(0.5 * self._budget / self._split_cost),
                ))
        n_steps = min(seg_cap, (num_clusters - 1) - i)
        # pad the compiled scan length to the next power of 2 (not always
        # CHAIN_SEG): inactive steps still pay the partition/commit
        # arithmetic, which is pure waste on short tails (a 12-cluster
        # run needs 10 steps, not 32)
        seg = 1
        while seg < n_steps:
            seg <<= 1
        seg = min(seg, CHAIN_SEG)
        state_pre = rng.get_state()
        root_seed = np.int32(runner.inits.next_seed() if do_root else 0)
        seeds = np.empty((seg, 2), dtype=np.int32)
        for s in range(seg):
            seeds[s, 0] = runner.inits.next_seed()
            seeds[s, 1] = runner.inits.next_seed()

        assign, labels_w, pri, pop, leaf = self._state
        mt = int(opts.maxterms)
        operand = (runner._A_ext if runner._A_ext is not None
                   else (runner.a_op, runner._A_chunks))
        _dbg(f"[chain] dispatch seg i={i} n_steps={n_steps} seg={seg} "
             f"do_root={do_root} split_cost={self._split_cost}")
        t_seg = time.perf_counter()
        carry, ys = _chain_program(
            operand, jnp.asarray(seeds), root_seed,
            jnp.asarray(i, jnp.int32), jnp.asarray(n_steps, jnp.int32),
            jnp.asarray(num_clusters - 2, jnp.int32),
            assign, labels_w, self.holder.current, pri, pop, leaf,
            opts=opts.nmf_opts, fdtype=self.fdtype,
            unbalanced=float(opts.unbalanced), widths=self.widths,
            seg=seg, restarts=runner.restarts,
            size_pop=(opts.priority_method == "size_ndcg"),
            do_root=do_root, max_terms=mt, init=runner.init,
            masked_ok=not runner.should_segment_full(),
        )
        flat = np.asarray(ys)  # ONE fetch: root row + step rows + terms
        seg_wall = time.perf_counter() - t_seg
        _dbg(f"[chain] seg done in {seg_wall:.2f}s")
        (assign, labels_w, W_slab, pri, pop, leaf, _, _, _) = carry
        self.holder.current = W_slab
        self._state = (assign, labels_w, pri, pop, leaf)

        row_w = 8 + 2 * self.nw
        rrow = flat[:row_w]
        ys_h = flat[row_w:row_w * (seg + 1)].reshape(seg, row_w)
        if mt > 0:
            tt = (np.ascontiguousarray(flat[row_w * (seg + 1):],
                                       dtype=np.float32)
                  .view(np.int32).reshape(self.nc + 1, 2, mt))
            # consumed by Tree.compute_top_terms for slab-backed nodes
            self.holder.topterms = tt

        root_consumed = 0
        if do_root:
            nmf_opts = opts.nmf_opts
            if rrow[0] > 0.5:
                self._root_W = SlabPair(self.holder, self.nc)
                self._root_left = _unpack_bits_host(
                    rrow[8:8 + self.nw].astype(np.float32)
                    .view(np.uint32), self.n)
                root_consumed = 1
                stats.nmf_count += 1
                riters = int(rrow[1])
                stats.iter_count += riters
                if riters >= nmf_opts.max_iter:
                    stats.max_count += 1
            else:
                # root attempt 1 failed on device: hand the whole retry
                # ladder to the host (it redraws the same seed for
                # attempt 1, preserving the sequential stream)
                rng.set_state(state_pre)
                self._dirty = True
                LAST_STATS["bails"] += 1
                return i, "bail"

        # --- replay committed splits through the host tree ---------------
        nmf_opts = opts.nmf_opts
        replayed = 0
        outcome = "ok"
        for s in range(n_steps):
            row = ys_h[s]
            stat = int(row[0])
            if stat == 3:
                outcome = "done"
                break
            if stat != 1:
                outcome = "bail" if stat == 2 else "ok"
                break
            popped = int(row[1])
            if i + replayed == 0:
                # split 0: the popped node is the virtual root
                if popped != self.nc:
                    outcome = "bail"
                    break
                tree.split_root(self._root_W, labels=self._root_left)
            else:
                _, max_pr, split_index = tree.min_max_leaf_priorities()
                if split_index != popped or max_pr < 0:
                    # pop-order divergence (should not happen): discard
                    # the rest of the segment and let the sequential
                    # engine take over for one split — state resync
                    # handles the slab.
                    outcome = "bail"
                    break
                W = W_buffer[split_index]
                left = L_buffer[split_index]
                tree.split(split_index, W, labels=left)
            c0, c1 = tree.index0, tree.index1
            words = row[8:].astype(np.float32).view(np.uint32)
            for slot, c in enumerate((c0, c1)):
                docs = tree.nodes[c].docs
                full = _unpack_bits_host(
                    words[slot * self.nw:(slot + 1) * self.nw], self.n
                )
                L_buffer[c] = full[docs]
                W_buffer[c] = SlabPair(self.holder, c)
                prv = float(np.float32(row[6 + slot]))
                # pop policy mirrors the sequential commit exactly (f64
                # product of the f32-rounded priority and the doc count)
                popv = prv
                if opts.priority_method == "size_ndcg" and prv > 0:
                    popv = prv * len(docs)
                tree.set_node_priority(c, prv, popv)
                stats.nmf_count += 1
                iters = int(row[4 + slot])
                stats.iter_count += iters
                if iters >= nmf_opts.max_iter:
                    stats.max_count += 1
            if opts.verbose:
                print(f"[{i + replayed + 1}] ", end="", flush=True)
            replayed += 1

        # roll the RNG stream back to exactly the consumed draws
        rng.set_state(state_pre)
        for _ in range(root_consumed + 2 * replayed):
            runner.inits.next_seed()

        if outcome == "ok" and replayed < n_steps:
            # replay stopped early without an explicit bail/done marker
            # (pop mismatch): force a resync + one sequential split
            outcome = "bail"
        if outcome == "bail":
            self._dirty = True
            LAST_STATS["bails"] += 1
        LAST_STATS["committed"] += replayed
        if self._budget is not None:
            # adapt the next segment to the measured per-split wall
            # (compile time inflates the first measurement, which only
            # shortens the next probe — the warm measurement corrects)
            self._split_cost = seg_wall / max(1, replayed + root_consumed)
        return i + replayed, outcome
