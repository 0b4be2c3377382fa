"""TPU batch 20: doc-blocked ELL on the 1M-doc rank-128 workload.

batch18 showed the segmented gather-product collapses 176 -> 46 GB/s
once the gathered table exceeds ~100 MB; EllAOp now builds row buckets
per 64k-doc block so AH' gathers from 33 MB slices.  This measures the
real mm_nt win, end-to-end MU and BPP iteration rates, and the blocked
path's numerical parity, on the BASELINE north-star shape.
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
    from smallk_tpu.common.options import (
        NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.ell import EllAOp
    from smallk_tpu.solvers.solve import nmf_solve

    m, n, k = 50_000, 1_000_000, 128
    t1 = time.perf_counter()
    A = random_sparse_matrix(Random(9), m, n, nz_per_col=80,
                             dtype=np.float32)
    print(f"  host gen: {time.perf_counter()-t1:.0f}s", flush=True)

    rng = Random(31)
    W = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))

    def timeit(f, *a, reps=3):
        g = jax.jit(f)
        jax.block_until_ready(g(*a))
        ts = []
        for _ in range(reps):
            t2 = time.perf_counter()
            jax.block_until_ready(g(*a))
            ts.append(time.perf_counter() - t2)
        return min(ts)

    # --- monolithic vs blocked products ---------------------------------
    t1 = time.perf_counter()
    mono = EllAOp.from_scipy(A, dtype=jnp.bfloat16, doc_block=0)
    jax.block_until_ready(mono.row_buckets[0][1])
    print(f"  build+ship mono: {time.perf_counter()-t1:.0f}s", flush=True)
    nt_mono = timeit(lambda op, H: op.mm_nt(H), mono, H)
    ref = np.asarray(jax.jit(lambda op, H: op.mm_nt(H))(mono, H),
                     np.float32)
    del mono

    t1 = time.perf_counter()
    ell = EllAOp.from_scipy(A, dtype=jnp.bfloat16)  # auto -> 64k blocks
    assert ell.row_blocks is not None
    jax.block_until_ready(ell.col_buckets[0][1])
    print(f"  build+ship blocked ({len(ell.row_blocks)} blocks): "
          f"{time.perf_counter()-t1:.0f}s", flush=True)
    del A
    nt_blk = timeit(lambda op, H: op.mm_nt(H), ell, H)
    out = np.asarray(jax.jit(lambda op, H: op.mm_nt(H))(ell, H),
                     np.float32)
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-30)
    print(f"  AH' mono {nt_mono*1e3:.0f} ms -> blocked {nt_blk*1e3:.0f} ms"
          f" ({nt_mono/nt_blk:.2f}x), rel maxdiff {rel:.2e}", flush=True)
    t_tn = timeit(lambda op, W: op.mm_tn(W), ell, W)
    print(f"  W'A: {t_tn*1e3:.0f} ms (col side, unchanged)", flush=True)

    # --- end-to-end iteration rates --------------------------------------
    for alg in (NmfAlgorithm.MU, NmfAlgorithm.BPP):
        opts = NmfOptions(
            tol=1e-9, algorithm=alg,
            prog_est_algorithm=NmfProgressAlgorithm.DELTA_FNORM
            if alg == NmfAlgorithm.MU else NmfProgressAlgorithm.PG_RATIO,
            k=k, min_iter=1, max_iter=10, verbose=False, dtype="float32",
            stall_patience=10_000,
        )
        r = nmf_solve(ell, W, H, opts)
        jax.block_until_ready(r.W)
        t2 = time.perf_counter()
        r = nmf_solve(ell, W, H, opts)
        jax.block_until_ready(r.W)
        dt = time.perf_counter() - t2
        print(f"  {alg.name}: {int(r.iterations)} iters in {dt:.1f}s = "
              f"{int(r.iterations)/dt:.2f} it/s", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
