"""Probe: masked-solver mode at k=8 (headline config) and small dense
shapes (flatclust regime) — completes the tpu_batch55 crossover grid.

Fresh process per mode:
  python scripts/tpu_batch56.py auto
  python scripts/tpu_batch56.py cg
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

    def rate_for(aop, m, n, k, iters_pair=(5, 25), a_dtype="bfloat16"):
        rng = Random(2024)
        W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
        H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
        walls = {}
        for iters in iters_pair:
            o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                           height=m, width=n, k=k, min_iter=1,
                           max_iter=iters, verbose=False,
                           a_dtype=a_dtype)
            r = nmf_solve(aop, W0, H0, o)
            int(r.iterations)
            t0 = time.perf_counter()
            r = nmf_solve(aop, W0, H0, o)
            int(r.iterations)
            walls[iters] = time.perf_counter() - t0
        lo, hi = iters_pair
        return (hi - lo) / max(walls[hi] - walls[lo], 1e-6)

    m, n = 12411, 7984
    A = random_sparse_matrix(Random(77), m, n, nz_per_col=80,
                             dtype=np.float32)
    aop = as_aop(A, dtype=jnp.bfloat16)
    for k in (8, 16):
        r = rate_for(aop, m, n, k, iters_pair=(20, 100))
        print(f"mode={mode} reuters-shape k={k:3d}: {r:8.1f} it/s",
              flush=True)

    # small dense shape (flatclust BPP regime)
    md = nd = 256
    Ad = jnp.asarray(random_matrix(md, nd, Random(42), dtype=np.float32))
    aopd = as_aop(np.asarray(Ad))
    for k in (8, 16, 32):
        r = rate_for(aopd, md, nd, k, iters_pair=(50, 250),
                     a_dtype="float32")
        print(f"mode={mode} dense 256x256  k={k:3d}: {r:8.1f} it/s",
              flush=True)


if __name__ == "__main__":
    main()
