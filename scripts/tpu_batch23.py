"""TPU batch 23 (round 3): k=128 x 1M-doc BPP — compact-passive masked
solve vs the full-k Pallas kernel (VERDICT r3 item #4, target >= 1 it/s).

ROUND_NOTES known-gap #5: at n=1M the H-side masked elimination costs
1.98 s/iter in the VMEM Pallas kernel (full-k GJ is O(n k^3) VPU work).
The compact-passive XLA path (_compact_solve_block) does O(n S^3) VPU
work plus O(n S k^2) MXU one-hot extraction (S=64 at k=128) — measure
which wins at this width, then the end-to-end BPP rate with the better
dispatch.
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def main():
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.solvers import nnls

    k, n = 128, 1_000_000
    rng = Random(5)
    rs = np.random.RandomState(7)

    # realistic Gram + passive density from the measured k=128 BPP profile
    # (scripts/probe_passive.py: mean ~30/128 passive, all distinct)
    B = np.asarray(random_matrix(k, 4 * k, rng, dtype=np.float32))
    LHS = jnp.asarray(B @ B.T / (4 * k) + 0.01 * np.eye(k),
                      jnp.float32)
    RHS = jnp.asarray(rs.rand(k, n).astype(np.float32))
    passive = jnp.asarray(rs.rand(k, n) < 0.25)

    def timeit(f, *a, reps=3):
        jax.block_until_ready(f(*a))
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t1)
        return min(ts)

    from smallk_tpu.solvers.pallas_kernels import masked_gj_solve_pallas

    f_pallas = jax.jit(masked_gj_solve_pallas)
    t_pallas = timeit(f_pallas, LHS, RHS, passive)
    print(f"  pallas full-k: {t_pallas*1e3:.0f} ms", flush=True)

    # force the XLA compact path through the public dispatcher
    nnls.set_masked_solver("xla")
    f_xla = jax.jit(nnls._masked_solve)
    t_xla = timeit(f_xla, LHS, RHS, passive)
    print(f"  xla compact (chunked): {t_xla*1e3:.0f} ms", flush=True)

    # masked-CG tier (the auto dispatch at n*k^3 > _CG_MIN_WORK)
    f_cg = jax.jit(nnls._cg_solve_block)
    t_cg = timeit(f_cg, LHS, RHS, passive)
    print(f"  masked CG: {t_cg*1e3:.0f} ms", flush=True)
    nnls.set_masked_solver("auto")

    # numerical parity on a slice
    xp = np.asarray(f_pallas(LHS, RHS[:, :8192], passive[:, :8192]))
    nnls.set_masked_solver("xla")
    xx = np.asarray(jax.jit(nnls._masked_solve)(
        LHS, RHS[:, :8192], passive[:, :8192]))
    nnls.set_masked_solver("auto")
    xc = np.asarray(f_cg(LHS, RHS[:, :8192], passive[:, :8192]))
    print(f"  parity maxdiff pallas-xla: {np.max(np.abs(xp - xx)):.2e}  "
          f"cg-xla: {np.max(np.abs(xc - xx)):.2e}", flush=True)

    # --- end-to-end BPP on the north-star shape -------------------------
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.ell import EllAOp
    from smallk_tpu.solvers.solve import nmf_solve

    m = 50_000
    t1 = time.perf_counter()
    # fast bulk generator (random_sparse_matrix's exact rejection sampler
    # costs ~143 s at 80M nnz; the BPP rate doesn't depend on the
    # duplicate-free property)
    import scipy.sparse as sp
    gs = np.random.RandomState(9)
    nzc = 80
    A = sp.csc_matrix(
        (gs.rand(n * nzc).astype(np.float32),
         gs.randint(0, m, n * nzc).astype(np.int32),
         np.arange(0, n * nzc + 1, nzc, dtype=np.int64)),
        shape=(m, n))
    A.sum_duplicates()
    print(f"  host gen: {time.perf_counter()-t1:.0f}s", flush=True)
    op = EllAOp.from_scipy(A, dtype=jnp.bfloat16)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))

    for mode in ("auto", "cg", "xla"):
        nnls.set_masked_solver(mode)
        walls = {}
        for iters in (2, 6):
            opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                              height=m, width=n, k=k, min_iter=1,
                              max_iter=iters, verbose=False,
                              a_dtype="bfloat16")
            r = nmf_solve(op, W0, H0, opts)
            r.W.block_until_ready()
            t1 = time.perf_counter()
            r = nmf_solve(op, W0, H0, opts)
            r.W.block_until_ready()
            walls[iters] = time.perf_counter() - t1
        rate = 4.0 / max(walls[6] - walls[2], 1e-6)
        print(f"  BPP 1M-doc k=128 [{mode}]: {rate:.2f} it/s "
              f"(2it {walls[2]:.1f}s, 6it {walls[6]:.1f}s, "
              f"success {bool(r.success)})", flush=True)
    nnls.set_masked_solver("auto")


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
