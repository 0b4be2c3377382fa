"""TPU batch 12: validate the all-rank Pallas masked-solve dispatch —
convergence at real tolerances across ranks + new throughput numbers."""
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
    from smallk_tpu.solvers.solve import nmf_solve

    m, n = 12411, 7984
    A = random_sparse_matrix(Random(2024), m, n, nz_per_col=80,
                             dtype=np.float32)
    Ad = jnp.asarray(A.toarray(), jnp.float32)
    a_op = as_aop(A, dtype=jnp.bfloat16)

    print("-- convergence at tol=0.005 (reference default) --", flush=True)
    for k in (8, 16, 32, 64, 128):
        rng = Random(50 + k)
        W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
        H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
        opts = NmfOptions(tol=0.005, algorithm=NmfAlgorithm.BPP,
                          height=m, width=n, k=k, min_iter=5,
                          max_iter=2000, verbose=False,
                          a_dtype="bfloat16")
        t1 = time.perf_counter()
        r = nmf_solve(a_op, W0, H0, opts)
        r.W.block_until_ready()
        dt = time.perf_counter() - t1
        rel = float(
            jnp.linalg.norm(Ad - r.W @ r.H) / jnp.linalg.norm(Ad)
        )
        neg = int(jnp.sum(r.W < 0)) + int(jnp.sum(r.H < 0))
        print(f"  k={k}: success={bool(r.success)} "
              f"converged={bool(r.converged)} iters={int(r.iterations)} "
              f"relerr={rel:.4f} neg={neg} ({dt:.1f}s incl compile)",
              flush=True)

    print("-- fixed-100-iteration throughput (bench headline shape) --",
          flush=True)
    for k in (8, 16, 32):
        rng = Random(2024)
        W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
        H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
        opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                          height=m, width=n, k=k, min_iter=1,
                          max_iter=100, verbose=False, a_dtype="bfloat16")
        r = nmf_solve(a_op, W0, H0, opts)
        r.W.block_until_ready()
        t1 = time.perf_counter()
        r = nmf_solve(a_op, W0, H0, opts)
        r.W.block_until_ready()
        rate = int(r.iterations) / (time.perf_counter() - t1)
        print(f"  k={k}: {rate:.0f} it/s", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
