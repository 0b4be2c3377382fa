"""Probe: 1M-doc k=128 BPP iteration breakdown + CG warm-start and
W-side-tier ablations (VERDICT r3 #4 follow-up: the fused gather kernel
is dead — libtpu crashes on tpu.dynamic_gather beyond one vreg
(tpu_batch33) and the XLA gather wall is ~0.4 Gnnz/s regardless of
formulation (tpu_batch32/34) — so the headroom is in the solve tier).

All timings are in-loop (chained reps inside one jit with a data
dependency) or two-point fits; standalone block_until_ready through the
tunnel is untrustworthy (tpu_batch31 vs 32).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch38.py
"""

import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

REPS = 4


def inloop(fn_one, *args):
    """Time fn_one chained REPS times inside one jit."""

    @jax.jit
    def bench(*a):
        def body(i, acc):
            out = fn_one(acc, *a)
            return acc + out

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    s = float(bench(*args))
    t0 = time.perf_counter()
    s = float(bench(*args))
    return (time.perf_counter() - t0) / REPS


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.ops.ell import EllAOp
    from smallk_tpu.solvers import nnls
    from smallk_tpu.solvers.nnls import nnls_blockpivot
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

    # steady state after 5 iterations (realistic passive sets / scales)
    o5 = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m1,
                    width=n1, k=k1, min_iter=1, max_iter=5,
                    verbose=False, a_dtype="bfloat16")
    r5 = nmf_solve(op1, W01, H01, o5)
    W = r5.W
    H = r5.H
    jax.block_until_ready(W)
    print("steady state ready", flush=True)

    # --- products
    dt = inloop(lambda acc, w: jnp.sum(
        op1.mm_tn(w + jnp.asarray(acc * 0.0, w.dtype))
        .astype(jnp.float32)) * 1e-20, W)
    print(f"mm_tn (W'A):  {dt*1e3:7.1f} ms", flush=True)
    dt = inloop(lambda acc, h: jnp.sum(
        op1.mm_nt(h + jnp.asarray(acc * 0.0, h.dtype))
        .astype(jnp.float32)) * 1e-20, H)
    print(f"mm_nt (AH'):  {dt*1e3:7.1f} ms", flush=True)

    # --- solve sides at the steady state
    WtW = jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST)
    WtA = op1.mm_tn(W).astype(jnp.float32)
    HHt = jnp.matmul(H, H.T, precision=jax.lax.Precision.HIGHEST)
    HAt = op1.mm_nt(H).astype(jnp.float32).T
    Wt = W.T
    jax.block_until_ready((WtW, WtA, HHt, HAt))

    def solve_h(acc, lhs, rhs, x):
        X, Y, ok, _ = nnls_blockpivot(
            lhs, rhs + jnp.asarray(acc * 0.0, rhs.dtype), x)
        return jnp.sum(X).astype(jnp.float32) * 1e-20

    for name, lhs, rhs, x in (
        ("H-side nnls (n=1M, CG tier)", WtW, WtA, H),
        ("W-side nnls (n=50k)", HHt, HAt, Wt),
    ):
        dt = inloop(solve_h, lhs, rhs, x)
        print(f"{name}: {dt*1e3:7.1f} ms", flush=True)

    # W-side with CG forced (tier ablation)
    nnls.set_masked_solver("cg")
    dt = inloop(solve_h, HHt, HAt, Wt)
    print(f"W-side nnls CG-forced: {dt*1e3:7.1f} ms", flush=True)
    nnls.set_masked_solver("auto")

    # --- full-iteration rate (two-point fit like bench.py)
    walls = {}
    for iters in (2, 6):
        o = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m1,
                       width=n1, k=k1, min_iter=1, max_iter=iters,
                       verbose=False, a_dtype="bfloat16")
        r = nmf_solve(op1, W01, H01, o)
        r.W.block_until_ready()
        t0 = time.perf_counter()
        r = nmf_solve(op1, W01, H01, o)
        r.W.block_until_ready()
        walls[iters] = time.perf_counter() - t0
    rate = 4.0 / max(walls[6] - walls[2], 1e-6)
    print(f"BPP end-to-end: {rate:.2f} it/s "
          f"({(walls[6]-walls[2])/4*1e3:.0f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
