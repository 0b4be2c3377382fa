"""TPU batch 3: k=128 kernel, k=128 BPP, hierclust with spectral init."""
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


def timeit(f, *a, reps=3):
    r = f(*a)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t1 = time.perf_counter()
        r = f(*a)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t1)
    return min(ts)


def kernel128():
    import smallk_tpu.solvers.nnls as nn
    from smallk_tpu.solvers.pallas_kernels import masked_gj_solve_pallas

    rng = np.random.RandomState(0)
    for k, n in [(128, 7984), (128, 12411)]:
        B = rng.rand(k, 2 * k).astype(np.float32)
        LHS = jnp.asarray(B @ B.T + 0.1 * np.eye(k, dtype=np.float32))
        RHS = jnp.asarray((B @ rng.rand(2 * k, n)).astype(np.float32))
        passive = jnp.asarray(rng.rand(k, n) > 0.6)
        t1 = time.perf_counter()
        f = jax.jit(masked_gj_solve_pallas)
        X = f(LHS, RHS, passive)
        X.block_until_ready()
        comp = time.perf_counter() - t1
        tp = timeit(f, LHS, RHS, passive)
        g = jax.jit(nn._chol_solve_block)
        tx = timeit(g, LHS, RHS, passive)
        d = float(jnp.max(jnp.abs(X - g(LHS, RHS, passive))))
        print(f"k={k} n={n}: pallas {tp*1000:.1f} ms (compile {comp:.0f}s) "
              f"xla-chol {tx*1000:.1f} ms maxdiff {d:.2e}", flush=True)


def bpp128():
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    m, n = 12411, 7984
    rng = Random(2024)
    A = random_sparse_matrix(rng, m, n, nz_per_col=80, dtype=np.float32)
    a_op = as_aop(A, dtype=jnp.bfloat16)
    k = 128
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    times = {}
    for iters in (5, 25):
        opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                          height=m, width=n, k=k, min_iter=1,
                          max_iter=iters, verbose=False,
                          a_dtype="bfloat16")
        t1 = time.perf_counter()
        res = nmf_solve(a_op, W0, H0, opts)
        res.W.block_until_ready()
        comp = time.perf_counter() - t1
        t1 = time.perf_counter()
        res = nmf_solve(a_op, W0, H0, opts)
        res.W.block_until_ready()
        times[iters] = time.perf_counter() - t1
        print(f"  k=128 iters={iters}: wall {times[iters]:.2f}s "
              f"(first {comp:.0f}s) ok={bool(res.success)}", flush=True)
    print(f"k=128 steady-state {20/(times[25]-times[5]):.2f} it/s",
          flush=True)


def hier_spectral():
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_hier

    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)
    for method in ("spectral", "random"):
        copts = ClustOptions(
            nmf_opts=NmfOptions(
                tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
                min_iter=1, max_iter=5000, verbose=False, dtype="float32",
                a_dtype="bfloat16", stall_patience=100,
            ),
            num_clusters=12, verbose=False, init_method=method,
        )
        clust_hier(A, copts, Random(1))  # compile
        t1 = time.perf_counter()
        _, stats = clust_hier(A, copts, Random(2))
        print(f"hierclust 12c init={method}: "
              f"{time.perf_counter()-t1:.2f}s "
              f"({stats.nmf_count} solves)", flush=True)


guard("kernel k=128", kernel128)
guard("bpp k=128", bpp128)
guard("hierclust spectral vs random", hier_spectral)
print("[done]", flush=True)
