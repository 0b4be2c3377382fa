"""Validate the size-gated loose CG residual target (nnls._CG_LOOSE_MIN_N).

Mid-scale workload where both tolerances are runnable: 50k x 250k,
k=64 BPP, tolerance run (tol 0.005) — iteration counts, success and
reconstruction error must match between the tight (64*eps) and loose
(1e-4) targets; then the per-iteration rate at the same width.

Fresh process per mode (the gate is read at trace time):
  python scripts/tpu_batch61.py loose
  python scripts/tpu_batch61.py tight
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "loose"
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.ops.ell import EllAOp
    from smallk_tpu.solvers import nnls
    from smallk_tpu.solvers.solve import nmf_solve

    if mode == "tight":
        nnls._CG_LOOSE_MIN_N = 1 << 62

    import scipy.sparse as sp

    m, n, k, nzc = 50_000, 250_000, 64, 80
    gs = np.random.RandomState(11)
    A = sp.csc_matrix(
        (gs.rand(n * nzc).astype(np.float32),
         gs.randint(0, m, n * nzc).astype(np.int32),
         np.arange(0, n * nzc + 1, nzc, dtype=np.int64)),
        shape=(m, n))
    A.sum_duplicates()
    op = EllAOp.from_scipy(A, dtype=jnp.bfloat16)
    rng = Random(5)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))

    # fixed-iteration rate at the same width
    walls = {}
    for iters in (3, 9):
        o2 = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m,
                        width=n, k=k, min_iter=1, max_iter=iters,
                        verbose=False, a_dtype="bfloat16")
        r2 = nmf_solve(op, W0, H0, o2)
        int(r2.iterations)
        t0 = time.perf_counter()
        r2 = nmf_solve(op, W0, H0, o2)
        int(r2.iterations)
        walls[iters] = time.perf_counter() - t0
    rate = 6.0 / max(walls[9] - walls[3], 1e-6)
    print(f"mode={mode} rate: {rate:.2f} it/s", flush=True)

    # tolerance run: convergence semantics must match
    o = NmfOptions(tol=0.005, algorithm=NmfAlgorithm.BPP, height=m,
                   width=n, k=k, min_iter=5, max_iter=60, verbose=False,
                   a_dtype="bfloat16")
    r = nmf_solve(op, W0, H0, o)
    nrmA = sp.linalg.norm(A)

    # relerr via ||A-WH||^2 = ||A||^2 - 2<A,WH> + ||WH||^2, all terms
    # computed ON DEVICE (a 64 MB factor d2h through the tunnel is both
    # slow and crash-prone) — only scalars are fetched
    @jax.jit
    def terms(W, H):
        AH = op.mm_nt(H.astype(jnp.float32))          # (m, k)
        cross = jnp.sum(AH.astype(jnp.float32) * W)
        nrmWH2 = jnp.sum((W.T @ W) * (H @ H.T))
        return cross, nrmWH2, jnp.max(W)

    cross, nrmWH2, wmax = (float(x) for x in terms(r.W, r.H))
    rel = np.sqrt(max(nrmA ** 2 - 2 * cross + nrmWH2, 0.0)) / nrmA
    print(f"mode={mode} tol-run: iters={int(r.iterations)} "
          f"success={bool(r.success)} relerr={rel:.5f} "
          f"Wmax={wmax:.4f}", flush=True)


if __name__ == "__main__":
    main()
