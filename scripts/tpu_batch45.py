"""Probe: trio re-measure at SEQ_PAIR_MIN=4096 + graph100
convergence-tuning ablation (the graph solves over-converge: NMI 0.999
at ~270 iters/solve — shorter stall patience / looser tol may hold
quality at a fraction of the iterations).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch45.py
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
    from smallk_tpu.engines.corpus import (
        planted_partition_graph, synthetic_term_doc_corpus,
    )
    from smallk_tpu.engines.graph import (
        graph_clust_options, normalized_adjacency,
    )
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering

    base = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
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
        print(f"{name:20s} wall={dt:.3f}s iters={stats.iter_count} "
              f"nmi={nmi:.3f}", flush=True)

    G, labels = planted_partition_graph(20000, 100, seed=17)
    Gn = normalized_adjacency(G)

    def gvariant(name, **nmf_over):
        g = graph_clust_options(100, restarts=1)
        g = dataclasses.replace(
            g, nmf_opts=dataclasses.replace(g.nmf_opts, **nmf_over))
        try:
            clust_hier(Gn, g, Random(1))
            dt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                tree, stats = clust_hier(Gn, g, Random(2))
                dt = min(dt, time.perf_counter() - t0)
            nmi = score_clustering(tree.assignments, labels)["nmi"]
            print(f"graph100 {name:28s} wall={dt:.2f}s "
                  f"iters={stats.iter_count} nmi={nmi:.3f}", flush=True)
        except Exception as e:
            print(f"graph100 {name:28s} FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)

    gvariant("r1 stall25", stall_patience=25)
    gvariant("r1 stall25 tol3e-4", stall_patience=25, tol=3e-4)
    gvariant("r1 stall10 tol1e-3", stall_patience=10, tol=1e-3)
    gvariant("r1 stall25 fp8", stall_patience=25,
             a_dtype="float8_e4m3fn")


if __name__ == "__main__":
    main()
