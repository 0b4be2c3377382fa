"""Probe: 1M-doc k=128 breakdown via two-point fits (tpu_batch38's
chained-inloop programs broke the remote compiler).

MU iterations = the two gather products + elementwise -> the product
share; BPP - MU ~= the NNLS solve tier (now with CG warm starts).
Also ablates the W-side solve tier: _CG_MIN_WORK lowered so the
(n=50k, k=128) W-side solve uses CG instead of the Pallas GJ.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch44.py
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
        r.W.block_until_ready()
        t0 = time.perf_counter()
        r = fn(iters)
        np.asarray(r.iterations)  # consume
        walls[iters] = time.perf_counter() - t0
    return max(walls[hi] - walls[lo], 1e-6) / (hi - lo)


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.ops.ell import EllAOp
    from smallk_tpu.solvers import nnls
    from smallk_tpu.solvers.solve import nmf_solve

    m1, n1, k1, nzc = 50_000, 1_000_000, 128, 80
    gs = np.random.RandomState(9)
    A1 = sp.csc_matrix(
        (gs.rand(n1 * nzc).astype(np.float32),
         gs.randint(0, m1, n1 * nzc).astype(np.int32),
         np.arange(0, n1 * nzc + 1, nzc, dtype=np.int64)),
        shape=(m1, n1))
    A1.sum_duplicates()
    op1 = EllAOp.from_scipy(A1, dtype=jnp.bfloat16)
    del A1
    print("corpus built", flush=True)

    rng1 = Random(5)
    W01 = jnp.asarray(random_matrix(m1, k1, rng1, dtype=np.float32))
    H01 = jnp.asarray(random_matrix(k1, n1, rng1, dtype=np.float32))

    def runner(alg):
        def fn(iters):
            o = NmfOptions(tol=1e-30, algorithm=alg, height=m1,
                           width=n1, k=k1, min_iter=1, max_iter=iters,
                           verbose=False, a_dtype="bfloat16")
            return nmf_solve(op1, W01, H01, o)

        return fn

    mu_it = two_point(runner(NmfAlgorithm.MU), 2, 6)
    print(f"MU   ms/iter: {mu_it*1e3:7.0f}  ({1.0/mu_it:.2f} it/s)",
          flush=True)
    bpp_it = two_point(runner(NmfAlgorithm.BPP), 2, 6)
    print(f"BPP  ms/iter: {bpp_it*1e3:7.0f}  ({1.0/bpp_it:.2f} it/s)  "
          f"solve tier ~{(bpp_it-mu_it)*1e3:.0f} ms", flush=True)

    # W-side tier ablation: CG for both sides
    old = nnls._CG_MIN_WORK
    nnls._CG_MIN_WORK = 5.0e10  # covers n=50k x k=128 (1.05e11)
    bpp2 = two_point(runner(NmfAlgorithm.BPP), 2, 6)
    print(f"BPP(CG both sides) ms/iter: {bpp2*1e3:7.0f}  "
          f"({1.0/bpp2:.2f} it/s)", flush=True)
    nnls._CG_MIN_WORK = old

    # convergence sanity at the CG-both-sides setting (pivot behavior)
    nnls._CG_MIN_WORK = 5.0e10
    o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m1,
                   width=n1, k=k1, min_iter=1, max_iter=10,
                   verbose=False, a_dtype="bfloat16")
    r = nmf_solve(op1, W01, H01, o)
    print(f"CG-both 10-iter success={bool(r.success)}", flush=True)
    nnls._CG_MIN_WORK = old


if __name__ == "__main__":
    main()
