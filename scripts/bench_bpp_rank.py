"""Steady-state BPP iterations/sec at a given rank on the TPU.

Times nmf_solve at max_iter=N_LO and N_HI; the difference isolates the
steady-state (warm-start) per-iteration cost from the cold-start NNLS
and compile.  Usage: bench_bpp_rank.py K [K2 ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.engines.matrixgen import random_sparse_matrix
from smallk_tpu.ops.aop import as_aop
from smallk_tpu.solvers.solve import nmf_solve

jax.device_get(jnp.zeros((1,)))  # d2h warmup

m, n = 12411, 7984
rng = Random(2024)
A = random_sparse_matrix(rng, m, n, nz_per_col=80, dtype=np.float32)
a_op = as_aop(A, dtype=jnp.bfloat16)

N_LO, N_HI = 5, 25

for k in [int(x) for x in sys.argv[1:]] or [128]:
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    times = {}
    for iters in (N_LO, N_HI):
        opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m,
                          width=n, k=k, min_iter=1, max_iter=iters,
                          verbose=False, a_dtype="bfloat16")
        t0 = time.perf_counter()
        res = nmf_solve(a_op, W0, H0, opts)
        res.W.block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = nmf_solve(a_op, W0, H0, opts)
        res.W.block_until_ready()
        times[iters] = time.perf_counter() - t0
        print(f"  k={k} iters={iters}: wall {times[iters]:.2f}s "
              f"(first call {compile_s:.0f}s) ok={bool(res.success)}",
              flush=True)
    rate = (N_HI - N_LO) / (times[N_HI] - times[N_LO])
    print(f"k={k:4d}: steady-state {rate:.2f} it/s "
          f"(cold-start overhead {times[N_LO] - N_LO / rate:.2f}s)",
          flush=True)
