"""Benchmark: NMF-BPP iterations/sec on a reuters-shaped sparse corpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): reference smallk NMF-BPP on reuters.mtx
(12411 x 7984 sparse, k=8) converged in 22 iterations / 0.633 s on an
8-thread CPU => 34.8 iterations/sec.  We time a fixed iteration count of
the same-shaped problem on one TPU chip and report iterations/sec.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # d2h warmup: first transfer through the TPU tunnel costs 45-235s
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.engines.matrixgen import random_sparse_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    m, n, k = 12411, 7984, 8
    iters = 100

    rng = Random(2024)
    A = random_sparse_matrix(rng, m, n, nz_per_col=80, dtype=np.float32)
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))

    # bf16 storage for A halves the HBM traffic of the dominant W'A / AH'
    # streams; all factor math, Grams and NNLS solves stay float32
    # (reconstruction error identical to f32-A at this rank).
    a_op = as_aop(A, dtype=jnp.bfloat16)

    opts = NmfOptions(
        tol=1e-30,  # unreachable: run exactly `iters` iterations
        algorithm=NmfAlgorithm.BPP,
        height=m, width=n, k=k,
        min_iter=1, max_iter=iters, verbose=False,
        a_dtype="bfloat16",
    )

    # compile + warm up
    res = nmf_solve(a_op, W0, H0, opts)
    res.W.block_until_ready()

    t0 = time.perf_counter()
    res = nmf_solve(a_op, W0, H0, opts)
    res.W.block_until_ready()
    elapsed = time.perf_counter() - t0

    assert bool(res.success), "benchmark run failed to solve"
    assert int(res.iterations) == iters, "benchmark must run all iterations"
    its_per_sec = int(res.iterations) / elapsed
    baseline = 22 / 0.633  # reference: 22 iters in 0.633 s
    print(json.dumps({
        "metric": "nmf_bpp_iters_per_sec_reuters_shape_k8",
        "value": round(its_per_sec, 2),
        "unit": "iterations/sec",
        "vs_baseline": round(its_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
