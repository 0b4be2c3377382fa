"""Probe: (1) HALS whole-step Pallas kernel rate at the bench config
(256x256 k=16, reference 2128 it/s, target >=10x = 21.3k it/s);
(2) the new 100-leaf GRAPH bench workload end-to-end (wall + NMI vs
the 90.4 s / 0.991-NMI CPU oracle anchor).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch42.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import (
        NmfAlgorithm, NmfOptions,
    )
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers import hals
    from smallk_tpu.solvers.solve import nmf_solve

    # --- HALS kernel vs XLA step at the bench config
    rng = Random(42)
    Ad = jnp.asarray(random_matrix(256, 256, rng, dtype=np.float32))
    W0 = jnp.asarray(random_matrix(256, 16, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(16, 256, rng, dtype=np.float32))
    hopts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.HALS,
                       height=256, width=256, k=16, min_iter=1,
                       max_iter=2000, verbose=False)
    aop = as_aop(np.asarray(Ad))
    for mode in ("xla", "auto"):
        hals.PALLAS_STEP = mode
        r = nmf_solve(aop, W0, H0, hopts)
        r.W.block_until_ready()
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            r = nmf_solve(aop, W0, H0, hopts)
            np.asarray(r.W)  # consume
            dt = time.perf_counter() - t0
            best = max(best, int(r.iterations) / dt)
        print(f"HALS 256x256 k16 [{mode}]: {best:.0f} it/s "
              f"(iters={int(r.iterations)})", flush=True)
        # correctness: converged factors reconstruct
        rel = float(np.linalg.norm(np.asarray(Ad)
                                   - np.asarray(r.W) @ np.asarray(r.H))
                    / np.linalg.norm(np.asarray(Ad)))
        print(f"  relerr {rel:.3f}", flush=True)
    hals.PALLAS_STEP = "auto"

    # --- 100-leaf graph workload (the new bench metric)
    from smallk_tpu.common.rng import Random as R2
    from smallk_tpu.engines.corpus import planted_partition_graph
    from smallk_tpu.engines.graph import (
        graph_clust_options, normalized_adjacency,
    )
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering

    G100, labels100 = planted_partition_graph(20000, 100, seed=17)
    Gn100 = normalized_adjacency(G100)
    gopts100 = graph_clust_options(100)
    t0 = time.perf_counter()
    clust_hier(Gn100, gopts100, R2(1))  # compile
    print(f"graph100 compile+first run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    dt100 = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        tree100, stats = clust_hier(Gn100, gopts100, R2(2))
        dt100 = min(dt100, time.perf_counter() - t0)
    nmi100 = score_clustering(tree100.assignments, labels100)["nmi"]
    print(f"graph100: wall={dt100:.2f}s iters={stats.iter_count} "
          f"solves={stats.nmf_count} nmi={nmi100:.3f} "
          f"(CPU oracle: 90.4s, nmi 0.991)", flush=True)


if __name__ == "__main__":
    main()
