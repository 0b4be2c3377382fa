"""Probe: TRUSTED per-iteration cost model for the fused pair solve —
iteration slope at fixed width/batch, via host-consumed results.

tpu_batch40 (end-to-end, trusted) showed fp8 A-storage saves only ~6%
of the 20news wall: the per-iteration cost must be dominated by a
width-independent fixed cost, not A streaming — contradicting
tpu_batch36's width-proportional slopes (which used the unreliable
block_until_ready).  This probe measures the slope the trusted way:
run the pair program at max_iter I1/I2, CONSUME the packed result on
the host, difference out dispatch+fetch.

Also measures batch scaling: vmap of 2 vs 8 children at the same
width — if the fixed cost is per while-iteration, an 8-batch divides
it 4x per solve (the multi-leaf chain lever).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch41.py
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import (
        NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.engines.hierclust import _gather_body

    m, n = 39727, 11237
    rs = np.random.RandomState(0)
    Ad = jnp.asarray(rs.rand(m, n), dtype=jnp.bfloat16)
    A_ext = jnp.concatenate([Ad, jnp.zeros((m, 1), jnp.bfloat16)],
                            axis=1)

    base = NmfOptions(
        tol=1e-30, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=10, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    import functools

    @functools.partial(jax.jit,
                       static_argnames=("opts", "B", "w"))
    def batch_solve(A_ext, idxB, seedsB, wpB, opts, B, w):
        outs = jax.vmap(
            lambda idx, sd, wpc: _gather_body(
                A_ext, idx, sd, wpc, n, opts, "random", jnp.float32, 1
            )
        )(idxB, seedsB, wpB)
        return outs[2]  # packed (B, 3 + w/32)

    for w in (512, 2048, 8192):
        for B in (2, 8):
            walls = {}
            for iters in (10, 60):
                opts = dataclasses.replace(base, max_iter=iters)
                idxB = np.full((B, w), n, np.int32)
                for i in range(B):
                    idxB[i, : w // 2] = rs.choice(n, w // 2,
                                                  replace=False)
                seeds = np.arange(3, 3 + B, dtype=np.int32)
                wpB = jnp.asarray(rs.rand(B, m).astype(np.float32))
                args = (A_ext, jnp.asarray(idxB), jnp.asarray(seeds),
                        wpB)
                packed = batch_solve(*args, opts=opts, B=B, w=w)
                np.asarray(packed)  # consume (compile+warm)
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(batch_solve(*args, opts=opts, B=B, w=w))
                    best = min(best, time.perf_counter() - t0)
                walls[iters] = best
            slope = (walls[60] - walls[10]) / 50
            fixed = walls[10] - 10 * slope
            print(f"w={w:5d} B={B}: {slope*1e3:7.3f} ms/iter "
                  f"({slope*1e3/B:6.3f} per solve)  fixed {fixed*1e3:6.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
