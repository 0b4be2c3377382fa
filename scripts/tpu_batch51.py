"""Probe: fp8 A-storage at the 1M-doc scale — does halving the gathered
row payload beat the row-issue-bound gather wall?  (Two-point MU fit;
BPP convergence sanity at 10 iterations.)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch51.py
"""

import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def two_point(fn, lo, hi):
    walls = {}
    for iters in (lo, hi):
        r = fn(iters)
        np.asarray(r.iterations)
        t0 = time.perf_counter()
        r = fn(iters)
        np.asarray(r.iterations)
        walls[iters] = time.perf_counter() - t0
    return max(walls[hi] - walls[lo], 1e-6) / (hi - lo)


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.ops.ell import EllAOp
    from smallk_tpu.solvers.solve import nmf_solve

    m1, n1, k1, nzc = 50_000, 1_000_000, 128, 80
    gs = np.random.RandomState(9)
    A1 = sp.csc_matrix(
        (gs.rand(n1 * nzc).astype(np.float32),
         gs.randint(0, m1, n1 * nzc).astype(np.int32),
         np.arange(0, n1 * nzc + 1, nzc, dtype=np.int64)),
        shape=(m1, n1))
    A1.sum_duplicates()
    rng1 = Random(5)
    W01 = jnp.asarray(random_matrix(m1, k1, rng1, dtype=np.float32))
    H01 = jnp.asarray(random_matrix(k1, n1, rng1, dtype=np.float32))

    for name, dt_a in (("bf16", jnp.bfloat16),
                       ("fp8", jnp.float8_e4m3fn)):
        try:
            op = EllAOp.from_scipy(A1, dtype=dt_a)

            def fn(iters, op=op):
                o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.MU,
                               height=m1, width=n1, k=k1, min_iter=1,
                               max_iter=iters, verbose=False,
                               a_dtype="bfloat16")
                return nmf_solve(op, W01, H01, o)

            dt = two_point(fn, 2, 6)
            print(f"MU {name}: {dt*1e3:6.0f} ms/iter "
                  f"({1.0/dt:.2f} it/s)", flush=True)

            def fnb(iters, op=op):
                o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                               height=m1, width=n1, k=k1, min_iter=1,
                               max_iter=iters, verbose=False,
                               a_dtype="bfloat16")
                return nmf_solve(op, W01, H01, o)

            dtb = two_point(fnb, 2, 6)
            r = fnb(10)
            print(f"BPP {name}: {dtb*1e3:6.0f} ms/iter "
                  f"({1.0/dtb:.2f} it/s) success={bool(r.success)}",
                  flush=True)
            del op
        except Exception as e:
            print(f"{name} FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
