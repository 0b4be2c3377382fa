"""Probe: per-iteration cost of the fused pair solve vs bucket width at
20news shape (m=39727), and the per-split decomposition of the chain.

Gives the floor model for VERDICT r3 #1: wall = sum over splits of
max(pair iters) x ms/iter(width) + per-step overhead.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch36.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hier_chain
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import (
        _fused_gather_pair, clust_hier,
    )

    m, n, kc = 39727, 11237, 20
    A, _ = synthetic_term_doc_corpus(m, n, kc, seed=13)
    Ad = jnp.asarray(np.asarray(A.todense()), jnp.bfloat16)
    A_ext = jnp.concatenate([Ad, jnp.zeros((m, 1), jnp.bfloat16)],
                            axis=1)

    base = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    # ms/iter at each width: run the pair program with tol=0 for exactly
    # I1 and I2 iterations; slope = per-iteration cost (excludes
    # dispatch+gather, which the difference cancels)
    import dataclasses

    rs = np.random.RandomState(0)
    print("width  ms/iter  gather+fixed ms")
    for w in (512, 1024, 2048, 4096, 8192):
        walls = {}
        for iters in (8, 40):
            opts = dataclasses.replace(base, tol=1e-30, max_iter=iters)
            idx = np.full((2, w), n, np.int32)
            idx[0, : w // 2] = rs.choice(n, w // 2, replace=False)
            idx[1, : w // 2] = rs.choice(n, w // 2, replace=False)
            seeds = np.array([3, 5], np.int32)
            wp = jnp.asarray(rs.rand(m, 2).astype(np.float32))
            args = (A_ext, jnp.asarray(idx), jnp.asarray(seeds), wp)
            kw = dict(n_full=n, opts=opts, init="random",
                      fdtype=jnp.float32, restarts=1)
            out = _fused_gather_pair(*args, **kw)
            jax.block_until_ready(out)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    _fused_gather_pair(*args, **kw))
                best = min(best, time.perf_counter() - t0)
            walls[iters] = best
        slope = (walls[40] - walls[8]) / 32
        fixed = walls[8] - 8 * slope
        print(f"{w:6d} {slope*1e3:8.3f} {fixed*1e3:10.1f}")

    # per-split decomposition: CHAIN_SEG=1 forces one dispatch+fetch per
    # split; the host wall per segment ~ device time + ~26 ms RTT
    copts = ClustOptions(nmf_opts=base, num_clusters=15, verbose=False)
    clust_hier(A, copts, Random(1))  # compile at seg default
    orig_seg = hier_chain.CHAIN_SEG
    hier_chain.CHAIN_SEG = 1
    orig_run = hier_chain.ChainDriver.run_segment
    rows = []

    def timed_run(self, i, *a, **kw):
        t0 = time.perf_counter()
        out = orig_run(self, i, *a, **kw)
        rows.append((i, time.perf_counter() - t0))
        return out

    hier_chain.ChainDriver.run_segment = timed_run
    try:
        clust_hier(A, copts, Random(2))  # compile seg=1 variants
        rows.clear()
        t0 = time.perf_counter()
        tree, stats = clust_hier(A, copts, Random(2))
        total = time.perf_counter() - t0
    finally:
        hier_chain.ChainDriver.run_segment = orig_run
        hier_chain.CHAIN_SEG = orig_seg
    print(f"\nCHAIN_SEG=1 total: {total:.3f} s, "
          f"iters={stats.iter_count}, solves={stats.nmf_count}")
    for i, dt in rows:
        print(f"  split {i:2d}: {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
