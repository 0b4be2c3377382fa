"""Probe: fp8 A-storage on the text bench workloads at the final
engine config (random init, element-threshold sequential siblings,
untransposed carry).  NMI must hold vs bf16.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch50.py
"""

import dataclasses
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

    base = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="float8_e4m3fn", stall_patience=100,
    )
    for name, m, n, kc, cs, k in (
        ("12c reuters-shape", 12411, 7984, 16, 11, 12),
        ("15c 20news-shape", 39727, 11237, 20, 13, 15),
        ("100 leaves text", 12411, 15968, 24, 17, 100),
    ):
        A, labels = synthetic_term_doc_corpus(m, n, kc, seed=cs)
        copts = ClustOptions(nmf_opts=base, num_clusters=k,
                             verbose=False)
        clust_hier(A, copts, Random(1))
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            tree, stats = clust_hier(A, copts, Random(2))
            dt = min(dt, time.perf_counter() - t0)
        nmi = score_clustering(tree.assignments, labels)["nmi"]
        print(f"fp8 {name:20s} wall={dt:.3f}s iters={stats.iter_count} "
              f"nmi={nmi:.3f}", flush=True)


if __name__ == "__main__":
    main()
