"""One-process TPU smoke/validation suite for smallk-tpu.

Runs the flows CPU tests cannot cover (Pallas kernels, f32 convergence,
the device-resident hierclust loop) against the real chip, serialized in
ONE process (first d2h through the tunnel costs 45-650 s per process —
never split TPU checks across processes).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_smoke.py

Pass criteria are printed per section; any FAIL line or traceback means
the change under test broke a TPU-only path that the CPU suite missed.
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)

FAILURES = []


def section(name, fn):
    print(f"== {name} ==", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        FAILURES.append(name)
        print(f"FAIL {name}", flush=True)


def bpp_convergence():
    """BPP at the reference default tolerance across ranks: must converge
    with zero negative entries (exercises the Pallas masked-GJ kernel at
    every rank plus the width-reduced pivot rounds at k>=48)."""
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    m, n = 12411, 7984
    A = random_sparse_matrix(Random(2024), m, n, nz_per_col=80,
                             dtype=np.float32)
    a_op = as_aop(A, dtype=jnp.bfloat16)
    for k in (8, 32, 128):
        rng = Random(50 + k)
        W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
        H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
        opts = NmfOptions(tol=0.005, algorithm=NmfAlgorithm.BPP,
                          height=m, width=n, k=k, min_iter=5,
                          max_iter=2000, verbose=False,
                          a_dtype="bfloat16")
        r = nmf_solve(a_op, W0, H0, opts)
        r.W.block_until_ready()
        neg = int(jnp.sum(r.W < 0)) + int(jnp.sum(r.H < 0))
        ok = bool(r.success) and bool(r.converged) and neg == 0
        print(f"  k={k}: success={bool(r.success)} "
              f"converged={bool(r.converged)} iters={int(r.iterations)} "
              f"neg={neg}", flush=True)
        assert ok, f"BPP k={k} failed on TPU"


def pallas_kernel_widths():
    """Masked-GJ kernel vs the XLA formulation at awkward widths
    (lane-constraint regressions only surface on real Mosaic)."""
    import smallk_tpu.solvers.nnls as nn
    from smallk_tpu.solvers.pallas_kernels import masked_gj_solve_pallas

    rng = np.random.RandomState(0)
    for k, n in [(128, 200), (8, 130), (64, 999), (48, 7984)]:
        B = rng.rand(k, 2 * k).astype(np.float32)
        LHS = jnp.asarray(B @ B.T + 0.1 * np.eye(k), jnp.float32)
        RHS = jnp.asarray((B @ rng.rand(2 * k, n)).astype(np.float32))
        passive = jnp.asarray(rng.rand(k, n) > 0.6)
        X = masked_gj_solve_pallas(LHS, RHS, passive)
        ref = (nn._gj_solve_block if k <= 64 else nn._chol_solve_block)(
            LHS, RHS, passive
        )
        d = float(jnp.max(jnp.abs(X - ref)))
        print(f"  k={k} n={n}: maxdiff {d:.2e}", flush=True)
        assert d < 1e-4, f"kernel mismatch at k={k} n={n}"


def hierclust_device_loop():
    """Device-resident hierclust on dense (gather path) and sparse
    (masked path) operands; wall clock printed for trend-watching."""
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.scoring import score_clustering

    from smallk_tpu.engines.hierclust import clust_hier

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )
    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)
    copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=12, verbose=False)
    clust_hier(A, copts, Random(1))
    t1 = time.perf_counter()
    tree, st = clust_hier(A, copts, Random(2))
    dt = time.perf_counter() - t1
    leaves = sum(1 for leaf in tree.is_leaf if leaf)
    print(f"  dense 12c: {dt:.2f}s, {st.nmf_count} solves, "
          f"{st.iter_count} iters, {leaves} leaves", flush=True)
    assert leaves == 12

    # sparse operand + quality: planted graph must recover communities
    # (same generator family as bench.py's NMI metric)
    from smallk_tpu.engines.corpus import planted_partition_graph

    nodes, kc = 1500, 10
    G, labels = planted_partition_graph(nodes, kc, seed=7)
    gopts = ClustOptions(nmf_opts=nmf_opts, num_clusters=kc, verbose=False)
    gtree, _ = clust_hier(G, gopts, Random(3))
    nmi = score_clustering(gtree.assignments, labels)["nmi"]
    print(f"  sparse planted-graph NMI: {nmi:.3f}", flush=True)
    assert nmi > 0.6, "community recovery regressed"


def hals_kernel_parity():
    """Whole-step HALS Pallas kernel vs the XLA step ON HARDWARE (the
    CPU test runs the interpreter; Mosaic lowering differences only
    show here).  One step from identical state must agree to f32
    roundoff."""
    import jax.numpy as jnp

    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.ops.aop import DenseAOp
    from smallk_tpu.solvers import hals

    rng = Random(42)
    A = jnp.asarray(random_matrix(256, 256, rng, dtype=np.float32))
    W0 = jnp.asarray(random_matrix(256, 16, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(16, 256, rng, dtype=np.float32))
    op = DenseAOp(A)
    st = hals.init(op, W0, H0)
    old = hals.PALLAS_STEP
    try:
        hals.PALLAS_STEP = "xla"
        ref = hals.step(op, W0, H0, st)
        hals.PALLAS_STEP = "pallas"
        out = hals.step(op, W0, H0, st)
    finally:
        hals.PALLAS_STEP = old
    errW = float(jnp.max(jnp.abs(out[0] - ref[0])))
    errH = float(jnp.max(jnp.abs(out[1] - ref[1])))
    print(f"  kernel-vs-xla one-step maxerr: W {errW:.2e} H {errH:.2e}",
          flush=True)
    assert errW < 1e-4 and errH < 1e-4


def other_algorithms():
    """MU / HALS / RANK2 f32 convergence plus flatclust end-to-end
    (direct and hier-refined) — the non-BPP solver families on real
    hardware."""
    from smallk_tpu.common.options import (
        NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.flatclust import run_flatclust
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    m, n, k = 800, 600, 8
    rng = Random(5)
    A = np.abs(np.random.RandomState(1).rand(m, n)).astype(np.float32)
    a_op = as_aop(A)
    for alg in ("MU", "HALS", "RANK2"):
        kk = 2 if alg == "RANK2" else k
        W0 = jnp.asarray(random_matrix(m, kk, rng, dtype=np.float32))
        H0 = jnp.asarray(random_matrix(kk, n, rng, dtype=np.float32))
        opts = NmfOptions(
            tol=0.005, algorithm=getattr(NmfAlgorithm, alg),
            prog_est_algorithm=(NmfProgressAlgorithm.DELTA_FNORM
                                if alg == "MU"
                                else NmfProgressAlgorithm.PG_RATIO),
            height=m, width=n, k=kk, min_iter=5, max_iter=5000,
            verbose=False, stall_patience=200,
        )
        r = nmf_solve(a_op, W0, H0, opts)
        r.W.block_until_ready()
        rel = float(np.linalg.norm(A - np.asarray(r.W) @ np.asarray(r.H))
                    / np.linalg.norm(A))
        print(f"  {alg}: success={bool(r.success)} "
              f"iters={int(r.iterations)} relerr={rel:.3f}", flush=True)
        assert bool(r.success) and rel < 0.9

    Ac, _labels = synthetic_term_doc_corpus(2000, 1200, 6, seed=3)
    fopts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.HALS,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO,
        height=2000, width=1200, k=6, min_iter=1, max_iter=3000,
        verbose=False, dtype="float32", stall_patience=100,
    )
    frng = Random(4)
    W0 = random_matrix(2000, 6, frng, dtype=np.float32)
    H0 = random_matrix(6, 1200, frng, dtype=np.float32)
    Wf, Hf, assign, fuzzy, ok = run_flatclust(Ac, W0, H0, fopts)
    assert ok and assign.shape == (1200,) and fuzzy.shape == (6, 1200)
    print(f"  flatclust HALS: {len(np.unique(assign))} clusters used",
          flush=True)


def chain_quality_gate():
    """Chain vs sequential ON TPU (VERDICT r3 #3).  The two engines
    trace the same solve body (hierclust._solve_from_draw) and are
    bit-identical on CPU, but XLA may fuse f32 arithmetic differently
    inside the chain's scan/switch, so trajectories can diverge on
    hardware.  Gate: the two trees' assignments must agree >= 0.95 NMI
    AND their flat reconstruction errors (NNLS refit of H against each
    tree's leaf topic vectors) must be within 2% relative — a silent
    chain-quality regression fails the smoke."""
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hier_chain
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_flat, clust_hier
    from smallk_tpu.engines.scoring import score_clustering

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )
    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)
    copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=12,
                         verbose=False)
    tree_c, _ = clust_hier(A, copts, Random(2))
    assert hier_chain.LAST_STATS["committed"] > 0, "chain did not engage"
    hier_chain.CHAIN = False
    try:
        tree_s, _ = clust_hier(A, copts, Random(2))
    finally:
        hier_chain.CHAIN = True

    nmi = score_clustering(tree_c.assignments, tree_s.assignments)["nmi"]

    fopts = ClustOptions(nmf_opts=nmf_opts, num_clusters=12,
                         verbose=False)
    norm_a = np.sqrt((A.data ** 2).sum())
    rels = []
    for tree in (tree_c, tree_s):
        W, H, ok = clust_flat(A, tree, fopts, Random(9))
        assert ok
        WtA = (A.T @ W).T  # k x n, sparse-aware
        err2 = (norm_a ** 2
                - 2.0 * float(np.sum(WtA * H))
                + float(np.sum((W.T @ W) * (H @ H.T))))
        rels.append(np.sqrt(max(err2, 0.0)) / norm_a)
    print(f"  chain-vs-seq assignment NMI: {nmi:.3f}; flat refit rel "
          f"err: chain {rels[0]:.4f} seq {rels[1]:.4f}", flush=True)
    # The two engines share one traced solve body but compile it in
    # different fusion contexts (scan/switch vs standalone), so f32
    # trajectories can diverge at borderline splits; the gate bounds
    # the divergence: trees must be structurally close (NMI floor) AND
    # equally GOOD (flat-refit reconstruction error within 2%) — a
    # silent chain-quality regression trips either line.
    assert abs(rels[0] - rels[1]) <= 0.02 * rels[1], \
        "chain tree objective regressed vs sequential"
    assert nmi >= 0.90, "chain tree diverged structurally from sequential"


section("BPP convergence across ranks", bpp_convergence)
section("Pallas masked-GJ at awkward widths", pallas_kernel_widths)
section("device-resident hierclust", hierclust_device_loop)
section("chain vs sequential quality gate", chain_quality_gate)
section("HALS whole-step kernel parity", hals_kernel_parity)
section("MU/HALS/RANK2 + flatclust", other_algorithms)
print(f"[done] failures: {FAILURES or 'none'}", flush=True)
raise SystemExit(1 if FAILURES else 0)
