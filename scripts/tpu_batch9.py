"""TPU batch 9: (a) where does the k=8 BPP iteration go — products vs
NNLS pivot rounds; (b) does width reduction help at low rank; (c) the
north-star capacity demo: rank-128 on a 1M-document corpus, one chip."""
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


def _mk(m=12411, n=7984, k=8, nz=80):
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop

    rng = Random(2024)
    A = random_sparse_matrix(rng, m, n, nz_per_col=nz, dtype=np.float32)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    return as_aop(A, dtype=jnp.bfloat16), W0, H0


def _opts(alg, m, n, k, iters):
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions

    return NmfOptions(tol=1e-30, algorithm=getattr(NmfAlgorithm, alg),
                      height=m, width=n, k=k, min_iter=1, max_iter=iters,
                      verbose=False, a_dtype="bfloat16")


def _rate(a_op, W0, H0, opts):
    from smallk_tpu.solvers.solve import nmf_solve

    r = nmf_solve(a_op, W0, H0, opts)
    r.W.block_until_ready()
    t1 = time.perf_counter()
    r = nmf_solve(a_op, W0, H0, opts)
    r.W.block_until_ready()
    return int(r.iterations) / (time.perf_counter() - t1), r


def algs_k8():
    m, n, k = 12411, 7984, 8
    a_op, W0, H0 = _mk(k=k)
    for alg in ("MU", "HALS", "BPP"):
        rate, _ = _rate(a_op, W0, H0, _opts(alg, m, n, k, 100))
        print(f"  {alg} k=8: {rate:.0f} it/s ({1000/rate:.2f} ms/it)",
              flush=True)


def nnls_direct():
    """Time one nnls_blockpivot at steady state (warm passive sets)."""
    from smallk_tpu.ops.dense import gemm
    from smallk_tpu.solvers.nnls import nnls_blockpivot
    from smallk_tpu.solvers.solve import nmf_solve

    m, n, k = 12411, 7984, 8
    a_op, W0, H0 = _mk(k=k)
    r = nmf_solve(a_op, W0, H0, _opts("BPP", m, n, k, 100))
    W, H = r.W, r.H
    WtW = gemm(W.T, W)
    WtA = a_op.mm_tn(W).astype(jnp.float32)

    f = jax.jit(nnls_blockpivot)
    # warm passive sets (steady state): Xinit = current H
    X, Y, ok = f(WtW, WtA, H)
    jax.block_until_ready(X)
    t1 = time.perf_counter()
    for _ in range(10):
        X, Y, ok = f(WtW, WtA, H)
    jax.block_until_ready(X)
    warm = (time.perf_counter() - t1) / 10
    # cold passive sets
    Xc = jnp.ones_like(H)
    X, Y, ok = f(WtW, WtA, Xc)
    jax.block_until_ready(X)
    t1 = time.perf_counter()
    for _ in range(10):
        X, Y, ok = f(WtW, WtA, Xc)
    jax.block_until_ready(X)
    cold = (time.perf_counter() - t1) / 10
    print(f"  nnls_blockpivot k=8 n=7984: warm-start {warm*1000:.2f} ms, "
          f"cold {cold*1000:.2f} ms", flush=True)


def reduce_at_k8():
    import smallk_tpu.solvers.nnls as nn

    m, n, k = 12411, 7984, 8
    a_op, W0, H0 = _mk(k=k)
    old = nn._COMPACT_MIN_K
    try:
        nn._COMPACT_MIN_K = 4
        jax.clear_caches()
        rate, r = _rate(a_op, W0, H0, _opts("BPP", m, n, k, 100))
        print(f"  BPP k=8 with width-reduced pivots: {rate:.0f} it/s "
              f"(success={bool(r.success)})", flush=True)
    finally:
        nn._COMPACT_MIN_K = old
        jax.clear_caches()


def capacity_1m():
    """North-star regime: rank-128 on a 1M-doc corpus (50k x 1M, 80M nnz,
    bucketed-ELL bf16).  The reference's int32 m*k / k*n checks reject
    this outright; we run it on ONE v5e chip."""
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.ell import EllAOp

    m, n, k = 50_000, 1_000_000, 128
    t1 = time.perf_counter()
    A = random_sparse_matrix(Random(9), m, n, nz_per_col=80,
                             dtype=np.float32)
    print(f"  host gen: {time.perf_counter()-t1:.0f}s "
          f"({A.nnz/1e6:.0f}M nnz)", flush=True)
    t1 = time.perf_counter()
    ell = EllAOp.from_scipy(A, dtype=jnp.bfloat16)
    jax.block_until_ready(ell.col_buckets[0][1])
    print(f"  build+ship ELL: {time.perf_counter()-t1:.0f}s", flush=True)
    del A
    rng = Random(31)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))

    for alg, iters in (("MU", 8), ("BPP", 3)):
        walls = {}
        for it_count in (1, 1 + iters):
            o = _opts(alg, m, n, k, it_count)
            t1 = time.perf_counter()
            rate, r = _rate(ell, W0, H0, o)
            walls[it_count] = 1.0 / rate * it_count
            print(f"    {alg} {it_count} iters: timed "
                  f"{walls[it_count]:.1f}s (compile+run "
                  f"{time.perf_counter()-t1:.0f}s)", flush=True)
        per_it = (walls[1 + iters] - walls[1]) / iters
        print(f"  {alg} k=128 on 50k x 1M: {1/per_it:.2f} it/s "
              f"steady-state", flush=True)


guard("alg comparison k=8", algs_k8)
guard("nnls direct timing", nnls_direct)
guard("width-reduced pivots at k=8", reduce_at_k8)
guard("capacity 1M docs rank-128", capacity_1m)
print("[done]", flush=True)
