"""Probe: (1) the three text hierclust workloads after transposed-W +
seq-all-pairs; (2) graph100 config ablation (restarts/pop policy/fp8 —
the bench config must be quality-equivalent to the oracle's NMI 0.991
but not pay for unnecessary restarts); (3) while-loop iteration floor
(does ANY kernel help HALS, or is 81 us/iter the device's loop floor?).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch43.py
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

    # --- while-loop iteration floor (trivial body)
    @jax.jit
    def loop_floor(x, iters):
        def body(c):
            i, v = c
            return (i + 1, v * 1.0000001 + 1e-9)

        return jax.lax.while_loop(lambda c: c[0] < iters, body,
                                  (jnp.int32(0), x))[1]

    for iters in (200, 2200):
        float(loop_floor(jnp.float32(1.0), jnp.int32(iters)))
    t0 = time.perf_counter()
    float(loop_floor(jnp.float32(1.0), jnp.int32(200)))
    t200 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop_floor(jnp.float32(1.0), jnp.int32(2200)))
    t2200 = time.perf_counter() - t0
    print(f"while-loop floor: {(t2200-t200)/2000*1e6:.1f} us/iter "
          f"(trivial body)", flush=True)

    # --- HALS bench config with the unrolled loop (auto U=8 at 256^2)
    from smallk_tpu.common.rng import random_matrix
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    rngh = Random(42)
    Ad = jnp.asarray(random_matrix(256, 256, rngh, dtype=np.float32))
    W0 = jnp.asarray(random_matrix(256, 16, rngh, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(16, 256, rngh, dtype=np.float32))
    aop = as_aop(np.asarray(Ad))
    for unroll in (0, 1, 16):
        hopts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.HALS,
                           height=256, width=256, k=16, min_iter=1,
                           max_iter=2000, verbose=False,
                           loop_unroll=unroll)
        r = nmf_solve(aop, W0, H0, hopts)
        np.asarray(r.W)
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            r = nmf_solve(aop, W0, H0, hopts)
            np.asarray(r.W)
            best = max(best, int(r.iterations) / (time.perf_counter() - t0))
        print(f"HALS 256x256 k16 unroll={unroll}: {best:.0f} it/s",
              flush=True)

    # --- text workloads after transposed-W + seq-all
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

    # --- graph100 config ablation
    G, labels = planted_partition_graph(20000, 100, seed=17)
    Gn = normalized_adjacency(G)
    cases = [
        ("preset (size_ndcg,r3)", graph_clust_options(100)),
        ("r1 size_ndcg", graph_clust_options(100, restarts=1)),
        ("r1 ndcg", graph_clust_options(100, restarts=1,
                                        priority_method="ndcg")),
    ]
    # fp8 variant of the cheapest config
    g8 = graph_clust_options(100, restarts=1)
    g8 = dataclasses.replace(
        g8, nmf_opts=dataclasses.replace(g8.nmf_opts,
                                         a_dtype="float8_e4m3fn"))
    cases.append(("r1 size_ndcg fp8", g8))
    for name, gopts in cases:
        try:
            clust_hier(Gn, gopts, Random(1))
            dt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                tree, stats = clust_hier(Gn, gopts, Random(2))
                dt = min(dt, time.perf_counter() - t0)
            nmi = score_clustering(tree.assignments, labels)["nmi"]
            print(f"graph100 {name:22s} wall={dt:.2f}s "
                  f"iters={stats.iter_count} nmi={nmi:.3f}", flush=True)
        except Exception as e:
            print(f"graph100 {name:22s} FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
