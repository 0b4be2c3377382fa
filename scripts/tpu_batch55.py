"""Probe: masked-solver crossover rank (pallas GJ vs warm-started CG)
at reuters width, plus a tolerance-based convergence parity check.

Fresh process per mode:
  python scripts/tpu_batch55.py auto
  python scripts/tpu_batch55.py cg
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers import nnls
    from smallk_tpu.solvers.solve import nmf_solve

    nnls.set_masked_solver(mode)
    m, n = 12411, 7984
    A = random_sparse_matrix(Random(77), m, n, nz_per_col=80,
                             dtype=np.float32)
    aop = as_aop(A, dtype=jnp.bfloat16)

    for k in (16, 32, 64, 128):
        rng = Random(2024)
        W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
        H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
        walls = {}
        for iters in (5, 25):
            o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                           height=m, width=n, k=k, min_iter=1,
                           max_iter=iters, verbose=False,
                           a_dtype="bfloat16")
            r = nmf_solve(aop, W0, H0, o)
            int(r.iterations)
            t0 = time.perf_counter()
            r = nmf_solve(aop, W0, H0, o)
            int(r.iterations)
            walls[iters] = time.perf_counter() - t0
        rate = 20.0 / max(walls[25] - walls[5], 1e-6)
        print(f"mode={mode} k={k:3d}: {rate:8.2f} it/s", flush=True)

    # tolerance-based convergence parity at k=128 (BPP progress-metric
    # run to tol 0.005, reference default): iterations + success +
    # final relerr must match the direct solver's to f32 noise
    k = 128
    rng = Random(2024)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    o = NmfOptions(tol=0.005, algorithm=NmfAlgorithm.BPP, height=m,
                   width=n, k=k, min_iter=5, max_iter=300,
                   verbose=False, a_dtype="bfloat16")
    r = nmf_solve(aop, W0, H0, o)
    W = np.asarray(r.W, np.float64)
    H = np.asarray(r.H, np.float64)
    Ad = np.asarray(A.todense(), np.float64)
    rel = np.linalg.norm(Ad - W @ H) / np.linalg.norm(Ad)
    print(f"mode={mode} tol-run k=128: iters={int(r.iterations)} "
          f"success={bool(r.success)} relerr={rel:.5f}", flush=True)


if __name__ == "__main__":
    main()
