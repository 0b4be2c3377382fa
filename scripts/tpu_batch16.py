"""TPU batch 16: anatomy of the 1M-doc rank-128 BPP iteration — ELL
products vs the two NNLS solves (at this scale per-op timings are valid:
the ~1 ms dispatch overhead is noise against 100s-of-ms ops)."""
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
    from smallk_tpu.ops.dense import gram, gram_t
    from smallk_tpu.ops.ell import EllAOp
    from smallk_tpu.solvers.nnls import nnls_blockpivot
    from smallk_tpu.solvers.solve import nmf_solve

    m, n, k = 50_000, 1_000_000, 128
    t1 = time.perf_counter()
    A = random_sparse_matrix(Random(9), m, n, nz_per_col=80,
                             dtype=np.float32)
    print(f"  host gen: {time.perf_counter()-t1:.0f}s", flush=True)
    t1 = time.perf_counter()
    ell = EllAOp.from_scipy(A, dtype=jnp.bfloat16)
    jax.block_until_ready(ell.col_buckets[0][1])
    print(f"  build+ship ELL: {time.perf_counter()-t1:.0f}s", flush=True)
    del A

    rng = Random(31)
    W = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))

    def timeit(f, *a, reps=3):
        g = jax.jit(f)
        r = g(*a)
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t2 = time.perf_counter()
            r = g(*a)
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t2)
        return min(ts)

    # pass the operand as a pytree ARGUMENT — closing over it bakes the
    # ~1 GB bucket arrays into the HLO as constants and the tunnel's
    # remote-compile endpoint rejects the payload (HTTP 413)
    t_tn = timeit(lambda op, W: op.mm_tn(W), ell, W)
    print(f"  W'A (ELL mm_tn, k x 1M out): {t_tn*1000:.0f} ms", flush=True)
    t_nt = timeit(lambda op, H: op.mm_nt(H), ell, H)
    print(f"  AH' (ELL mm_nt, 50k x k out): {t_nt*1000:.0f} ms", flush=True)

    # steady-state-ish NNLS inputs: run a few BPP iters first
    opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m,
                      width=n, k=k, min_iter=1, max_iter=3,
                      verbose=False, a_dtype="bfloat16")
    r = nmf_solve(ell, W, H, opts)
    r.W.block_until_ready()
    Ws, Hs = r.W, r.H

    WtW = gram(Ws)
    WtA = jax.jit(lambda op, W_: op.mm_tn(W_))(ell, Ws).astype(jnp.float32)
    t_h = timeit(lambda a, b, c: nnls_blockpivot(a, b, c)[0],
                 WtW, WtA, Hs)
    print(f"  H-side NNLS (k=128, n=1M, warm): {t_h*1000:.0f} ms",
          flush=True)

    HHt = gram_t(Hs)
    HAt = jax.jit(lambda op, H_: op.mm_nt(H_))(ell, Hs).T.astype(jnp.float32)
    t_w = timeit(lambda a, b, c: nnls_blockpivot(a, b, c)[0],
                 HHt, HAt, Ws.T)
    print(f"  W-side NNLS (k=128, n=50k, warm): {t_w*1000:.0f} ms",
          flush=True)

    # whole-iteration reference point
    walls = {}
    for iters in (1, 4):
        o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m,
                       width=n, k=k, min_iter=1, max_iter=iters,
                       verbose=False, a_dtype="bfloat16")
        rr = nmf_solve(ell, W, H, o)
        rr.W.block_until_ready()
        t2 = time.perf_counter()
        rr = nmf_solve(ell, W, H, o)
        rr.W.block_until_ready()
        walls[iters] = time.perf_counter() - t2
    per = (walls[4] - walls[1]) / 3
    print(f"  BPP whole-iteration: {per:.2f} s "
          f"(products {t_tn+t_nt:.2f}s + NNLS {t_h+t_w:.2f}s "
          f"+ rest {per-(t_tn+t_nt+t_h+t_w):.2f}s)", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
