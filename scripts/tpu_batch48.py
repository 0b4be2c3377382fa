"""Probe: spectral-p2 on the bench 12c/15c/100L workloads at the final
engine config (T=False, element-threshold sequential siblings) — the
last shave toward 12c <= 0.25 s and 20news <= 1.03 s.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch48.py
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
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering
    from smallk_tpu.solvers import rank2

    base = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )
    rank2.SPECTRAL_POWER_ITERS = 2
    try:
        for name, m, n, kc, cs, k in (
            ("12c reuters-shape", 12411, 7984, 16, 11, 12),
            ("15c 20news-shape", 39727, 11237, 20, 13, 15),
            ("100 leaves text", 12411, 15968, 24, 17, 100),
        ):
            A, labels = synthetic_term_doc_corpus(m, n, kc, seed=cs)
            copts = ClustOptions(nmf_opts=base, num_clusters=k,
                                 verbose=False, init_method="spectral")
            clust_hier(A, copts, Random(1))
            dt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                tree, stats = clust_hier(A, copts, Random(2))
                dt = min(dt, time.perf_counter() - t0)
            nmi = score_clustering(tree.assignments, labels)["nmi"]
            print(f"spectral-p2 {name:20s} wall={dt:.3f}s "
                  f"iters={stats.iter_count} nmi={nmi:.3f}", flush=True)
    finally:
        rank2.SPECTRAL_POWER_ITERS = 6


if __name__ == "__main__":
    main()
