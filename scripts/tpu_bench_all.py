"""One-process TPU measurement batch: masked-solve kernels, BPP ranks,
and the full bench.  Writes incremental results to stdout (flushed)."""
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def section(name):
    print(f"== {name} ==", flush=True)


def guard(fn):
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


def kernels():
    import smallk_tpu.solvers.nnls as nn
    from smallk_tpu.solvers.pallas_kernels import masked_gj_solve_pallas

    rng = np.random.RandomState(0)
    for k, n in [(32, 7984), (64, 7984), (128, 7984), (128, 12411)]:
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
        g = jax.jit(nn._gj_solve_block if k <= 64 else nn._chol_solve_block)
        tx = timeit(g, LHS, RHS, passive)
        d = float(jnp.max(jnp.abs(X - g(LHS, RHS, passive))))
        print(f"k={k:4d} n={n:6d}: pallas {tp*1000:7.1f} ms "
              f"(compile {comp:.0f}s) xla {tx*1000:7.1f} ms "
              f"maxdiff {d:.2e}", flush=True)


def bpp_ranks():
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    m, n = 12411, 7984
    rng = Random(2024)
    A = random_sparse_matrix(rng, m, n, nz_per_col=80, dtype=np.float32)
    a_op = as_aop(A, dtype=jnp.bfloat16)
    for k in (64, 128):
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
            print(f"  k={k} iters={iters}: wall {times[iters]:.2f}s "
                  f"(first {comp:.0f}s) ok={bool(res.success)}", flush=True)
        rate = 20 / (times[25] - times[5])
        print(f"k={k:4d}: steady-state {rate:.2f} it/s", flush=True)


def full_bench():
    import subprocess

    print("[running bench.py --all in-process]", flush=True)
    sys.argv = ["bench.py"]
    import importlib
    import bench

    importlib.reload(bench)
    bench.main()


section("masked-solve kernels")
guard(kernels)
section("BPP high ranks")
guard(bpp_ranks)
section("bench.py")
guard(full_bench)
print("[done]", flush=True)
