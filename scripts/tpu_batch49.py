"""Probe: where do the 1M-doc products lose 2x vs the gather wall?

tpu_batch44: MU = 820 ms/iter, but two 80M-nnz gather products at the
measured 0.4 Gnnz/s wall should cost ~400 ms.  Suspects: doc/term
blocking overhead (partial accumulation), inverse-permutation takes,
bucket concatenation.  Two-point MU fits with blocking toggled.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch49.py
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

    def mu_rate(op):
        def fn(iters):
            o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.MU,
                           height=m1, width=n1, k=k1, min_iter=1,
                           max_iter=iters, verbose=False,
                           a_dtype="bfloat16")
            return nmf_solve(op, W01, H01, o)

        return two_point(fn, 2, 6)

    for name, kw in (
        ("blocked auto (as-is)", {}),
        ("doc-block off", {"doc_block": 0}),
        ("doc+term block off", {"doc_block": 0, "term_block": 0}),
        ("doc-block 262144", {"doc_block": 262144}),
    ):
        try:
            op = EllAOp.from_scipy(A1, dtype=jnp.bfloat16, **kw)
            dt = mu_rate(op)
            print(f"MU {name:24s} {dt*1e3:6.0f} ms/iter "
                  f"({1.0/dt:.2f} it/s)", flush=True)
            del op
        except Exception as e:
            print(f"MU {name:24s} FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
