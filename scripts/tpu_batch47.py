"""Probe: graph100 config sweep around the 10x boundary (fp8 + stall /
tol points; bench config selection for the north-star metric).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch47.py
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import planted_partition_graph
    from smallk_tpu.engines.graph import (
        graph_clust_options, normalized_adjacency,
    )
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering

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
            print(f"graph100 {name:30s} wall={dt:.2f}s "
                  f"iters={stats.iter_count} nmi={nmi:.3f}", flush=True)
        except Exception as e:
            print(f"graph100 {name:30s} FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    gvariant("fp8 stall25 tol3e-4", stall_patience=25, tol=3e-4,
             a_dtype="float8_e4m3fn")
    gvariant("fp8 stall15 tol1e-4", stall_patience=15,
             a_dtype="float8_e4m3fn")
    gvariant("fp8 stall25 tol1e-3", stall_patience=25, tol=1e-3,
             a_dtype="float8_e4m3fn")
    gvariant("fp8 stall50 tol1e-4", stall_patience=50,
             a_dtype="float8_e4m3fn")


if __name__ == "__main__":
    main()
