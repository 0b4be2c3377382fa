"""TPU batch 26 (round 3): BPP k=8 per-phase decomposition.

Headline floor analysis: per BPP iteration the A-passes are WtA and HAt
(bf16 198 MB each => ~0.5 ms at ~800 GB/s); measured 1059 it/s
(0.94 ms/iter) is 53% of that floor.  Break the iteration into phases
to find the other ~0.44 ms: Grams, the two NNLS pivot loops (Pallas GJ
masked solves + delta tolerances), and the gradient recompute.
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def main():
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.ops.dense import gemm
    from smallk_tpu.solvers import nnls
    from smallk_tpu.solvers.solve import nmf_solve

    m, n, k = 12411, 7984, 8
    rng = Random(2024)
    A = random_sparse_matrix(rng, m, n, nz_per_col=80, dtype=np.float32)
    W = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    op = as_aop(A, dtype=jnp.bfloat16)

    def timeit(f, *a, reps=50):
        r = jax.block_until_ready(f(*a))
        t1 = time.perf_counter()
        for _ in range(reps):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t1) / reps, r

    # phase 1: the two A passes
    f_wta = jax.jit(lambda W: op.mm_tn(W))
    f_aht = jax.jit(lambda H: op.mm_nt(H))
    t_wta, WtA = timeit(f_wta, W)
    t_aht, AHt = timeit(f_aht, H)
    print(f"  WtA: {t_wta*1e3:.3f} ms   AHt: {t_aht*1e3:.3f} ms",
          flush=True)

    # phase 2: Grams
    f_gram = jax.jit(lambda W, H: (gemm(W.T, W), gemm(H, H.T)))
    t_gram, (WtW, HHt) = timeit(f_gram, W, H)
    print(f"  Grams: {t_gram*1e3:.3f} ms", flush=True)

    # phase 3: NNLS pivot loops (steady-state warm start)
    f_nnls_h = jax.jit(lambda L, R, X: nnls.nnls_blockpivot(L, R, X))
    t_nnls_h, (Xh, Yh, okh) = timeit(f_nnls_h, WtW, WtA, H)
    t_nnls_w, (Xw, Yw, okw) = timeit(
        f_nnls_h, HHt, AHt.T.astype(jnp.float32), W.T)
    print(f"  NNLS H-side (k{k} x n{n}): {t_nnls_h*1e3:.3f} ms ok={okh}",
          flush=True)
    print(f"  NNLS W-side (k{k} x m{m}): {t_nnls_w*1e3:.3f} ms ok={okw}",
          flush=True)

    # whole-iteration reference: fixed 100-iter solve wall
    for iters in (20, 120):
        o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m,
                       width=n, k=k, min_iter=1, max_iter=iters,
                       verbose=False, a_dtype="bfloat16")
        r = nmf_solve(op, W, H, o)
        r.W.block_until_ready()
        t1 = time.perf_counter()
        r = nmf_solve(op, W, H, o)
        r.W.block_until_ready()
        wall = time.perf_counter() - t1
        if iters == 20:
            w20 = wall
        else:
            per_it = (wall - w20) / 100.0
            print(f"  steady-state: {per_it*1e3:.3f} ms/iter "
                  f"({1.0/per_it:.0f} it/s)", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
