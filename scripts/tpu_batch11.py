"""TPU batch 11: pallas-only vs reduce+pallas across ranks — where does
width reduction actually pay?  Sets the production dispatch thresholds."""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def sweep():
    import smallk_tpu.solvers.nnls as nn
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    m, n = 12411, 7984
    A = random_sparse_matrix(Random(7), m, n, nz_per_col=80,
                             dtype=np.float32)
    a_op = as_aop(A, dtype=jnp.bfloat16)
    old_k = nn._COMPACT_MIN_K
    try:
        for k, iters in ((16, 60), (32, 60), (64, 40), (128, 30)):
            rng = Random(100 + k)
            W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
            H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
            opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                              height=m, width=n, k=k, min_iter=1,
                              max_iter=iters, verbose=False,
                              a_dtype="bfloat16")
            for label, reduce_w in (("pallas-only", False),
                                    ("reduce+pallas", True)):
                nn._COMPACT_MIN_K = 4 if reduce_w else 10_000
                nn.set_masked_solver("pallas")
                jax.clear_caches()
                r = nmf_solve(a_op, W0, H0, opts)
                r.W.block_until_ready()
                t1 = time.perf_counter()
                r = nmf_solve(a_op, W0, H0, opts)
                r.W.block_until_ready()
                rate = int(r.iterations) / (time.perf_counter() - t1)
                print(f"  k={k} {label}: {rate:.1f} it/s "
                      f"(success={bool(r.success)})", flush=True)
    finally:
        nn._COMPACT_MIN_K = old_k
        nn.set_masked_solver("auto")
        jax.clear_caches()


print("== pallas-only vs reduce+pallas sweep ==", flush=True)
try:
    sweep()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
