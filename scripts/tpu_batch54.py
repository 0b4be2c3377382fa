"""Probe: masked-solver backend for k=128 BPP at reuters width.

The auto dispatch uses the Pallas GJ kernel at n*k^3 <= 1e12; the GJ's
serial k-chain elimination costs ~40 ms/solve at k=128 x 7984 while the
products are sub-ms — if the warm-started CG tier (<= k+16 MXU matmuls)
beats 40 ms here, the threshold should drop.

Fresh process per mode (MASKED_SOLVER is read at trace time):
  python scripts/tpu_batch54.py auto
  python scripts/tpu_batch54.py cg
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
    m, n, k = 12411, 7984, 128
    rng = Random(2024)
    A = random_sparse_matrix(Random(77), m, n, nz_per_col=80,
                             dtype=np.float32)
    aop = as_aop(A, dtype=jnp.bfloat16)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    walls = {}
    for iters in (5, 25):
        o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m,
                       width=n, k=k, min_iter=1, max_iter=iters,
                       verbose=False, a_dtype="bfloat16")
        r = nmf_solve(aop, W0, H0, o)
        int(r.iterations)
        t0 = time.perf_counter()
        r = nmf_solve(aop, W0, H0, o)
        int(r.iterations)
        walls[iters] = time.perf_counter() - t0
    rate = 20.0 / max(walls[25] - walls[5], 1e-6)
    # quality: relative reconstruction error after 25 iters
    W = np.asarray(r.W, np.float64)
    H = np.asarray(r.H, np.float64)
    Ad = np.asarray(A.todense(), np.float64)
    rel = np.linalg.norm(Ad - W @ H) / np.linalg.norm(Ad)
    print(f"mode={mode}: {rate:.2f} it/s (5it {walls[5]:.2f}s / "
          f"25it {walls[25]:.2f}s) relerr={rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
