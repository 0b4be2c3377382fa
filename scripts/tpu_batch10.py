"""TPU batch 10: k=8 BPP ablation — width-reduced pivot rounds vs the
Pallas VMEM masked-GJ kernel, separately and together, in ONE process
(absolute it/s varies run-to-run through the tunnel; only within-process
ratios are trusted)."""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def guard(name, fn):
    print(f"== {name} ==", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print("[section failed; continuing]", flush=True)


def ablate():
    import smallk_tpu.solvers.nnls as nn
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    m, n, k = 12411, 7984, 8
    rng = Random(2024)
    A = random_sparse_matrix(rng, m, n, nz_per_col=80, dtype=np.float32)
    a_op = as_aop(A, dtype=jnp.bfloat16)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m,
                      width=n, k=k, min_iter=1, max_iter=100,
                      verbose=False, a_dtype="bfloat16")

    base_W = None
    # (label, reduce_width at k=8?, solver)
    configs = [
        ("baseline (xla GJ, full-width rounds)", False, "xla"),
        ("width-reduced rounds only", True, "xla"),
        ("pallas kernel only", False, "pallas"),
        ("both", True, "pallas"),
        ("baseline again (variance check)", False, "xla"),
    ]
    old_k = nn._COMPACT_MIN_K
    old_gj = nn._GJ_MAX_K
    try:
        for label, reduce_w, solver in configs:
            # reduce_width gate is (n >= _REDUCE_MIN_N and k >=
            # _COMPACT_MIN_K); the solver choice keys off _COMPACT_MIN_K /
            # _GJ_MAX_K + MASKED_SOLVER.  Setting MASKED_SOLVER explicitly
            # decouples the two.
            nn._COMPACT_MIN_K = 4 if reduce_w else old_k
            nn._GJ_MAX_K = old_gj
            nn.set_masked_solver(solver)
            jax.clear_caches()
            r = nmf_solve(a_op, W0, H0, opts)
            r.W.block_until_ready()
            t1 = time.perf_counter()
            r = nmf_solve(a_op, W0, H0, opts)
            r.W.block_until_ready()
            rate = int(r.iterations) / (time.perf_counter() - t1)
            if base_W is None:
                base_W = np.asarray(r.W, np.float64)
                drift = 0.0
            else:
                Wn = np.asarray(r.W, np.float64)
                drift = float(
                    np.linalg.norm(Wn - base_W) / np.linalg.norm(base_W)
                )
            print(f"  {label}: {rate:.0f} it/s "
                  f"(success={bool(r.success)}, relW-drift {drift:.2e})",
                  flush=True)
    finally:
        nn._COMPACT_MIN_K = old_k
        nn._GJ_MAX_K = old_gj
        nn.set_masked_solver("auto")
        jax.clear_caches()


def ablate_k16_k32():
    """Same ablation at the mid ranks the auto dispatch currently leaves
    on the XLA GJ path."""
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
        for k in (16, 32):
            rng = Random(100 + k)
            W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
            H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
            opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                              height=m, width=n, k=k, min_iter=1,
                              max_iter=60, verbose=False,
                              a_dtype="bfloat16")
            for label, reduce_w, solver in (
                ("baseline", False, "xla"),
                ("reduce+pallas", True, "pallas"),
            ):
                nn._COMPACT_MIN_K = 4 if reduce_w else old_k
                nn.set_masked_solver(solver)
                jax.clear_caches()
                r = nmf_solve(a_op, W0, H0, opts)
                r.W.block_until_ready()
                t1 = time.perf_counter()
                r = nmf_solve(a_op, W0, H0, opts)
                r.W.block_until_ready()
                rate = int(r.iterations) / (time.perf_counter() - t1)
                print(f"  k={k} {label}: {rate:.0f} it/s "
                      f"(success={bool(r.success)})", flush=True)
    finally:
        nn._COMPACT_MIN_K = old_k
        nn.set_masked_solver("auto")
        jax.clear_caches()


guard("k=8 ablation", ablate)
guard("k=16/32 ablation", ablate_k16_k32)
print("[done]", flush=True)
