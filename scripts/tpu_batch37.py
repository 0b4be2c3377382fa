"""Probe: bucket-ladder + sequential-wide-pair chain — wall clock + iteration
counts + quality on the three hierclust bench workloads (VERDICT r3
#1b).

Run (after any other TPU job finishes):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch37.py
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.device_get(jnp.zeros((1,)))  # d2h warmup

    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hier_chain
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    workloads = [
        ("12c reuters-shape", 12411, 7984, 16, 11, 12),
        ("15c 20news-shape", 39727, 11237, 20, 13, 15),
        ("100 leaves", 12411, 15968, 24, 17, 100),
    ]
    for name, m, n, kc, cseed, clusters in workloads:
        A, labels = synthetic_term_doc_corpus(m, n, kc, seed=cseed)
        for init in ("random",):
            copts = ClustOptions(
                nmf_opts=nmf_opts, num_clusters=clusters, verbose=False,
                init_method=init,
            )
            tree, stats = clust_hier(A, copts, Random(1))  # compile
            dt = float("inf")
            for _rep in range(2):
                t0 = time.perf_counter()
                tree, stats = clust_hier(A, copts, Random(2))
                dt = min(dt, time.perf_counter() - t0)
            nmi = score_clustering(tree.assignments, labels)["nmi"]
            print(f"{name:20s} init={init:9s} wall={dt:.3f}s "
                  f"iters={stats.iter_count} solves={stats.nmf_count} "
                  f"nmi={nmi:.3f} bails={hier_chain.LAST_STATS['bails']}",
                  flush=True)


if __name__ == "__main__":
    main()
