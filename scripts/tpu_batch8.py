"""TPU batch 8: device-resident hierclust wall clock (the round-2
wall-clock lever: fused node programs, labels-only d2h), spectral A/B,
plus headline sanity after the refactor."""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def guard(name, fn):
    print(f"== {name} ==", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print("[section failed; continuing]", flush=True)


def _copts(init_method="random"):
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )

    return ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4, algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
            min_iter=1, max_iter=5000, verbose=False, dtype="float32",
            a_dtype="bfloat16", stall_patience=100,
        ),
        num_clusters=12, verbose=False, init_method=init_method,
    )


def hier_wall():
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_hier

    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)
    copts = _copts()
    t1 = time.perf_counter()
    clust_hier(A, copts, Random(1))  # compile
    print(f"  compile+first run: {time.perf_counter()-t1:.1f}s", flush=True)
    for seed in (2, 3, 4):
        t1 = time.perf_counter()
        _, stats = clust_hier(A, copts, Random(seed))
        print(f"  seed {seed}: {time.perf_counter()-t1:.2f}s "
              f"({stats.nmf_count} solves, {stats.max_count} max-iter)",
              flush=True)


def hier_spectral():
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_hier

    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)
    copts = _copts("spectral")
    clust_hier(A, copts, Random(1))  # compile
    for seed in (2, 3):
        t1 = time.perf_counter()
        _, stats = clust_hier(A, copts, Random(seed))
        print(f"  spectral seed {seed}: {time.perf_counter()-t1:.2f}s "
              f"({stats.nmf_count} solves)", flush=True)


def headline():
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    m, n, k = 12411, 7984, 8
    rng = Random(2024)
    A = random_sparse_matrix(rng, m, n, nz_per_col=80, dtype=np.float32)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    a_op = as_aop(A, dtype=jnp.bfloat16)
    opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m,
                      width=n, k=k, min_iter=1, max_iter=100,
                      verbose=False, a_dtype="bfloat16")
    res = nmf_solve(a_op, W0, H0, opts)
    res.W.block_until_ready()
    t1 = time.perf_counter()
    res = nmf_solve(a_op, W0, H0, opts)
    res.W.block_until_ready()
    dt = time.perf_counter() - t1
    print(f"  BPP k=8: {100/dt:.0f} it/s", flush=True)


def hier_sparse():
    """Sparse-operand hierclust: drives the fused masked path + NDCG on
    device + assignments (end-to-end verify flow)."""
    import scipy.sparse as sp

    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering

    nodes, kc = 3000, 20
    g_rng = np.random.RandomState(7)
    labels_true = g_rng.randint(0, kc, nodes)
    rows, cols = [], []
    for c in range(kc):
        members = np.where(labels_true == c)[0]
        deg = 20 * len(members)
        rows.append(g_rng.choice(members, deg))
        cols.append(g_rng.choice(members, deg))
    rows.append(g_rng.randint(0, nodes, 2 * nodes))
    cols.append(g_rng.randint(0, nodes, 2 * nodes))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    G = sp.csc_matrix(
        (np.ones(len(r), np.float32), (r, c)), shape=(nodes, nodes)
    )
    G = ((G + G.T) > 0).astype(np.float32)
    copts = _copts()
    copts = type(copts)(
        nmf_opts=copts.nmf_opts, num_clusters=kc, verbose=False
    )
    t1 = time.perf_counter()
    gtree, stats = clust_hier(G, copts, Random(3))
    nmi = score_clustering(gtree.assignments, labels_true)["nmi"]
    print(f"  sparse hierclust 20c: {time.perf_counter()-t1:.1f}s "
          f"(incl compile), NMI {nmi:.3f}, {stats.nmf_count} solves",
          flush=True)


guard("hierclust device-resident wall", hier_wall)
guard("hierclust sparse-operand (verify flow)", hier_sparse)
guard("hierclust spectral A/B", hier_spectral)
guard("BPP headline", headline)
print("[done]", flush=True)
